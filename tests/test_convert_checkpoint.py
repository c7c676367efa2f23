"""Torch-reference checkpoint conversion: mapping + roundtrip into a model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
from makani_tpu.tools.convert_torch_checkpoint import map_reference_state_dict, apply_to_tree


def _fake_reference_state(embed=8, chans=3, layers=2, lmax=8):
    """Synthesize a reference-shaped state_dict (names and shapes as the
    PyTorch SFNO produces them)."""
    rng = np.random.RandomState(0)
    sd = {}
    sd["module.model.encoder.fwd.0.weight"] = rng.randn(embed, chans, 1, 1).astype(np.float32)
    sd["module.model.encoder.fwd.0.bias"] = rng.randn(embed).astype(np.float32)
    sd["module.model.encoder.fwd.2.weight"] = rng.randn(embed, embed, 1, 1).astype(np.float32)
    for i in range(layers):
        sd[f"module.model.blocks.{i}.filter.filter.weight"] = (
            rng.randn(embed, embed, lmax) + 1j * rng.randn(embed, embed, lmax)).astype(np.complex64)
        for n in ["norm0", "norm1"]:
            sd[f"module.model.blocks.{i}.{n}.weight"] = np.ones(embed, np.float32)
            sd[f"module.model.blocks.{i}.{n}.bias"] = np.zeros(embed, np.float32)
        sd[f"module.model.blocks.{i}.outer_skip.weight"] = rng.randn(embed, embed, 1, 1).astype(np.float32)
        sd[f"module.model.blocks.{i}.mlp.fwd.0.weight"] = rng.randn(2 * embed, embed, 1, 1).astype(np.float32)
        sd[f"module.model.blocks.{i}.mlp.fwd.0.bias"] = rng.randn(2 * embed).astype(np.float32)
        sd[f"module.model.blocks.{i}.mlp.fwd.3.weight"] = rng.randn(embed, 2 * embed, 1, 1).astype(np.float32)
        sd[f"module.model.blocks.{i}.mlp.fwd.3.bias"] = rng.randn(embed).astype(np.float32)
    sd["module.model.decoder.fwd.0.weight"] = rng.randn(embed, embed, 1, 1).astype(np.float32)
    sd["module.model.decoder.fwd.0.bias"] = rng.randn(embed).astype(np.float32)
    sd["module.model.decoder.fwd.2.weight"] = rng.randn(chans, embed, 1, 1).astype(np.float32)
    sd["module.model.residual_transform.weight"] = rng.randn(chans, chans, 1, 1).astype(np.float32)
    return sd


def test_reference_checkpoint_mapping_roundtrip():
    embed, chans, layers = 8, 3, 2
    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=chans, out_chans=chans, embed_dim=embed, num_layers=layers,
        operator_type="dhconv", normalization_layer="instance_norm", use_mlp=True)
    x = jnp.zeros((1, chans, 16, 32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # wrap in the stepper-style tree root ("model/...") used by the converter
    template = {"model": variables["params"]}

    lmax = 8  # = (16 // 2) from scale_factor 2
    sd = _fake_reference_state(embed, chans, layers, lmax)
    mapped = map_reference_state_dict(sd)
    new_tree, missing, unused = apply_to_tree(template, mapped, strict=False)

    assert not unused, f"unused source tensors: {unused}"
    assert not missing, f"unmatched target params: {missing}"

    # converted weights actually landed: spectral weight matches real-pair form
    w_src = sd["module.model.blocks.0.filter.filter.weight"]
    w_dst = np.asarray(new_tree["model"]["blocks_0"]["SpectralFilterLayer_0"]["filter"]["weight"])
    np.testing.assert_allclose(w_dst[..., 0], w_src.real, rtol=1e-6)
    np.testing.assert_allclose(w_dst[..., 1], w_src.imag, rtol=1e-6)

    # and the model runs with the converted tree
    y = jax.jit(lambda v, a: model.apply(v, a))({"params": new_tree["model"]},
                                                jnp.ones((1, chans, 16, 32)))
    assert np.isfinite(np.asarray(y)).all()


def test_convert_real_torch_tar_roundtrip(tmp_path):
    """End-to-end: a real torch-saved ckpt_mp0.tar through convert() into an
    orbax checkpoint, restored and verified (runs only when torch is present —
    the converter's torch.load path was previously untestable)."""
    torch = pytest.importorskip("torch")
    from makani_tpu.models import model_registry
    from makani_tpu.tools.convert_torch_checkpoint import convert
    from makani_tpu.utils import checkpoint as ckpt_lib
    from tests.testutils import get_default_parameters

    embed, chans, layers = 8, 3, 2
    params = get_default_parameters()
    params.update_params({
        "nettype": "SFNO",
        "in_channels": [0, 1, 2],
        "out_channels": [0, 1, 2],
        "channel_names": ["u10m", "v10m", "t2m"],
        "img_shape_x": 16, "img_shape_y": 32,
        "embed_dim": embed, "num_layers": layers, "scale_factor": 2,
        "num_blocks": 4, "normalization_layer": "instance_norm",
        "hard_thresholding_fraction": 1.0, "use_mlp": True, "mlp_ratio": 2.0,
        "activation_function": "gelu", "pos_embed": "none",
        "operator_type": "dhconv", "filter_type": "linear",
    })
    params.img_crop_shape_x, params.img_crop_shape_y = 16, 32
    params.img_crop_offset_x = params.img_crop_offset_y = 0
    params.N_in_channels = params.N_out_channels = chans

    sd = _fake_reference_state(embed, chans, layers, lmax=8)
    tar = tmp_path / "ckpt_mp0.tar"
    torch.save({"model_state": {k: torch.from_numpy(v) for k, v in sd.items()},
                "iters": 7, "epoch": 3}, str(tar))

    out = tmp_path / "converted"
    missing, unused = convert(str(tar), str(out), params)
    assert not missing and not unused, (missing, unused)
    ckpt_lib.wait_for_saves()

    model = model_registry.get_model(params)
    x = jnp.zeros((1, chans, 16, 32), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    restored, _, counters = ckpt_lib.restore_checkpoint(str(out), template)
    assert counters["iters"] == 7 and counters["epoch"] == 3
    w_src = sd["module.model.blocks.0.filter.filter.weight"]
    w_dst = np.asarray(
        restored["model"]["blocks_0"]["SpectralFilterLayer_0"]["filter"]["weight"])
    np.testing.assert_allclose(w_dst[..., 0], w_src.real, rtol=1e-6)
    np.testing.assert_allclose(w_dst[..., 1], w_src.imag, rtol=1e-6)
