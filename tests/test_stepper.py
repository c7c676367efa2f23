"""Stepper-level semantics: lsm gating in single- and multi-step wrappers,
per-sample longitude-roll augmentation.

Covers the round-3 verdict defects: the MultiStepWrapper previously accepted
`lsm_mask_channels` but never applied it (ref fork capability:
makani/models/stepper.py:45-66), and the trainer's longitude roll drew one
shift per BATCH where the reference's DALI pipeline draws per-sample shifts
(ref: makani/utils/dataloaders/data_loader_dali_2d.py:79-88).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from testutils import get_default_parameters
from makani_tpu.parallel import comm


@pytest.fixture(autouse=True)
def serial_mesh():
    comm.reset()
    comm.init(devices=jax.devices()[:1])
    yield
    comm.reset()


def _lsm_params(tmp_path, n_future):
    lsm = np.zeros((24, 48), np.float32)
    lsm[:, :24] = 1.0  # land on the western half
    np.save(tmp_path / "lsm.npy", lsm)

    params = get_default_parameters()
    params.nettype = "SFNO"
    params.update_params({
        "img_shape_x": 24, "img_shape_y": 48,
        "embed_dim": 8, "num_layers": 2, "scale_factor": 2,
        "use_mlp": False, "pos_embed": "none",
        "operator_type": "dhconv", "filter_type": "linear",
        "normalization_layer": "instance_norm",
        "add_landmask": True, "landmask_path": str(tmp_path / "lsm.npy"),
        "lsm_mask_channels": [1],
        "n_future": n_future,
        "target": "default",  # no residual add: gated channel stays zeroed
    })
    params.img_crop_shape_x, params.img_crop_shape_y = 24, 48
    params.img_crop_offset_x = params.img_crop_offset_y = 0
    params.img_local_shape_x, params.img_local_shape_y = 24, 48
    params.img_local_offset_x = params.img_local_offset_y = 0
    # N_in_channels includes the 2 landmask one-hot planes (what
    # trainer._update_parameters would derive)
    params.N_in_channels = 6
    params.N_out_channels = 4
    return params, lsm


def test_multistep_lsm_gate_applied(tmp_path):
    """Training-mode MultiStepWrapper must gate configured channels by the
    land plane at EVERY unrolled step (previously silently un-applied)."""
    from makani_tpu.models import model_registry
    from makani_tpu.models.stepper import MultiStepWrapper

    params, lsm = _lsm_params(tmp_path, n_future=1)
    model = model_registry.get_model(params)
    assert isinstance(model, MultiStepWrapper)
    assert model.lsm_mask_channels == (1,)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 24, 48).astype(np.float32)
    variables = jax.jit(lambda k, a: model.init(k, a, deterministic=False))(
        jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(1)}))(
        variables, jnp.asarray(x)))

    # (B, (n_future+1)*C, H, W): channel 1 of each unrolled step is zero
    # over water (lsm == 0, eastern half)
    water = lsm == 0.0
    C = 4
    for step in range(2):
        gated = y[:, step * C + 1]
        assert np.abs(gated[:, water]).max() == 0.0
        # and NOT identically zero over land (the gate, not a dead channel)
        assert np.abs(gated[:, ~water]).max() > 0.0
    # ungated channels are untouched over water
    assert np.abs(y[:, 0][:, water]).max() > 0.0


def test_multistep_eval_matches_single_step_with_lsm(tmp_path):
    """Eval-mode MultiStepWrapper is a single step — with identical weights it
    must agree exactly with SingleStepWrapper, including the lsm gate."""
    from makani_tpu.models import model_registry

    params_m, _ = _lsm_params(tmp_path, n_future=1)
    params_s, _ = _lsm_params(tmp_path, n_future=0)
    multi = model_registry.get_model(params_m)
    single = model_registry.get_model(params_s)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 24, 48).astype(np.float32)
    variables = jax.jit(lambda k, a: single.init(k, a, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x))

    y_single = np.asarray(jax.jit(
        lambda v, a: single.apply(v, a, deterministic=True))(variables, jnp.asarray(x)))
    y_multi = np.asarray(jax.jit(
        lambda v, a: multi.apply(v, a, deterministic=True))(variables, jnp.asarray(x)))
    np.testing.assert_allclose(y_multi, y_single, rtol=1e-6, atol=1e-6)


def test_lon_roll_is_per_sample():
    """augment_batch draws an independent shift per sample; every sample is an
    exact circular roll of its original, applied identically to inp/tar."""
    from makani_tpu.utils.trainer import augment_batch

    rng = np.random.RandomState(2)
    B, T, C, H, W = 4, 1, 2, 8, 64
    inp = rng.randn(B, T, C, H, W).astype(np.float32)
    tar = rng.randn(B, T, C, H, W).astype(np.float32)

    out_inp, out_tar, _, _ = jax.jit(
        lambda i, t, k: augment_batch(i, t, None, None, k, True, 0.0))(
        jnp.asarray(inp), jnp.asarray(tar), jax.random.PRNGKey(3))
    out_inp, out_tar = np.asarray(out_inp), np.asarray(out_tar)

    shifts = []
    for b in range(B):
        found = [s for s in range(W)
                 if np.array_equal(out_inp[b], np.roll(inp[b], s, axis=-1))]
        assert len(found) == 1, f"sample {b} is not a clean roll"
        s = found[0]
        shifts.append(s)
        # target rolled by the SAME per-sample shift
        np.testing.assert_array_equal(out_tar[b], np.roll(tar[b], s, axis=-1))
    # per-sample: shifts must not all coincide (P(collision) = W^-(B-1))
    assert len(set(shifts)) > 1, f"all samples share one shift {shifts}"
