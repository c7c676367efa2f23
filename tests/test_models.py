"""Per-registry-model build + forward-shape + gradient tests
(mirrors ref: tests/test_models.py:44-69)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from testutils import get_default_parameters

from makani_tpu.models import model_registry


def _base_params(nettype):
    params = get_default_parameters()
    params.nettype = nettype
    params.img_shape_x = 32
    params.img_shape_y = 64
    params.img_crop_shape_x = 32
    params.img_crop_shape_y = 64
    params.img_crop_offset_x = 0
    params.img_crop_offset_y = 0
    params.N_in_channels = 4
    params.N_out_channels = 4
    # small model hyperparams
    params.update_params({
        "embed_dim": 16,
        "num_layers": 2,
        "num_blocks": 4,
        "scale_factor": 2,
        "depth": 2,
        "num_heads": 2,
        "patch_size": (8, 8),
        "normalization_layer": "instance_norm",
        "hard_thresholding_fraction": 1.0,
        "use_mlp": True,
        "mlp_ratio": 2.0,
        "activation_function": "gelu",
        "pos_embed": "none",
        "operator_type": "dhconv",
        "filter_type": "linear",
    })
    return params


MODELS = ["SFNO", "FNO", "AFNO", "AFNOv1", "ViT", "DebugNet"]


@pytest.mark.parametrize("nettype", MODELS)
def test_model_forward_backward(nettype):
    params = _base_params(nettype)
    model = model_registry.get_model(params)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 32, 64).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(333), x)

    y = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert y.shape == (2, 4, 32, 64)
    assert np.isfinite(np.asarray(y)).all()

    def loss_fn(v, x):
        return jnp.mean(model.apply(v, x) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables, x)
    leaves = jax.tree.leaves(grads)
    assert len(leaves) > 0
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total)
    assert total > 0.0


def test_multistep_wrapper():
    params = _base_params("DebugNet")
    params.n_future = 2
    model = model_registry.get_model(params)

    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 32, 64).astype(np.float32))
    variables = jax.jit(lambda k, x: model.init(k, x, deterministic=False))(jax.random.PRNGKey(0), x)
    # training unroll concatenates n_future+1 predictions over channels
    y = jax.jit(lambda v, x: model.apply(v, x, deterministic=False))(variables, x)
    assert y.shape == (1, 4 * 3, 32, 64)
    # DebugNet is identity (factor 1): every step returns the input
    for s in range(3):
        np.testing.assert_allclose(np.asarray(y[:, s * 4:(s + 1) * 4]), np.asarray(x), rtol=1e-6)
    # eval path: single step
    y_eval = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))(variables, x)
    assert y_eval.shape == (1, 4, 32, 64)


def test_registry_listing():
    names = model_registry.list_models()
    for n in MODELS:
        assert n in names
