"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops.complex_ops import contract_dhconv
from makani_tpu.ops.pallas_kernels import contract_dhconv_pallas


def _rand_cplx(rng, shape):
    return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(np.complex64)


@pytest.mark.parametrize("B,C,O,L,M", [(2, 8, 8, 6, 10), (1, 16, 8, 4, 128)])
def test_dhconv_pallas_matches_einsum(B, C, O, L, M):
    rng = np.random.RandomState(0)
    x = jnp.asarray(_rand_cplx(rng, (B, C, L, M)))
    w = jnp.asarray(_rand_cplx(rng, (C, O, L)))

    ref = contract_dhconv(x, w)
    out = contract_dhconv_pallas(x, w, True)  # interpret mode
    # the kernel hand-rolls the 3-pass bf16 (TF32-equivalent) decomposition
    # even in interpret mode, so tolerance is bf16x3-level, not exact-f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-3)


def test_dhconv_pallas_grads_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(_rand_cplx(rng, (1, 6, 4, 12)))
    w = jnp.asarray(_rand_cplx(rng, (6, 6, 4)))

    def loss_ref(x, w):
        return jnp.sum(jnp.abs(contract_dhconv(x, w)) ** 2)

    def loss_pl(x, w):
        return jnp.sum(jnp.abs(contract_dhconv_pallas(x, w, True)) ** 2)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(x, w)

    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_ref), rtol=5e-3, atol=5e-3)
