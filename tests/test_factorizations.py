"""Factorized spectral conv tests (CP/Tucker/TT/Dense weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.networks.sfnonet import SphericalFourierNeuralOperatorNet


@pytest.mark.parametrize("factorization", ["ComplexDense", "ComplexCP", "ComplexTucker", "ComplexTT"])
def test_factorized_sfno_forward_backward(factorization):
    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
        inp_chans=3, out_chans=3, embed_dim=8, num_layers=2,
        operator_type="dhconv", factorization=factorization, rank=0.5,
        normalization_layer="instance_norm", use_mlp=True)

    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16, 32).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    assert y.shape == (1, 3, 16, 32)
    assert np.isfinite(np.asarray(y)).all()

    g = jax.jit(jax.grad(lambda v, a: jnp.mean(model.apply(v, a) ** 2)))(variables, x)
    total = sum(float(jnp.sum(jnp.abs(t))) for t in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0

    # factorized weights are smaller than dense for CP at small rank
    # (TT middle cores are r*s*r and can exceed dense at toy sizes)
    if factorization in ("ComplexCP",):
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
        dense = SphericalFourierNeuralOperatorNet(
            inp_shape=(16, 32), out_shape=(16, 32), scale_factor=2,
            inp_chans=3, out_chans=3, embed_dim=8, num_layers=2,
            operator_type="dhconv", normalization_layer="instance_norm", use_mlp=True)
        vd = jax.jit(dense.init)(jax.random.PRNGKey(0), x)
        n_dense = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vd))
        assert n_params < n_dense
