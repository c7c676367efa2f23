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
