"""Stacked-real coefficient engine: equivalence with the complex XLA path.

The serial fast path (ops/sht.py coefficient-engine switch + SpectralConv's
stacked dhconv pipeline) must be numerically interchangeable with the
complex-einsum path — same transforms, same contraction math, different
layouts/engines. These tests pin forward AND gradient equivalence, plus the
interpret-mode Pallas wrappers' custom-VJP rules against jax.grad of the
einsum forms (ref semantics: makani/models/common/spectral_convolution.py:
124-141, contractions.py:131-136).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops import sht as sht_lib
from makani_tpu.ops import RealSHT, InverseRealSHT


@pytest.fixture(autouse=True)
def _reset_engine():
    yield
    sht_lib.set_coeff_engine("xla")


def _stacked_to_complex(z):
    mmax = z.shape[0] // 2
    return jnp.moveaxis(jax.lax.complex(z[:mmax], z[mmax:]), 0, -1)


@pytest.mark.parametrize("grid,nlat,nlon", [
    ("legendre-gauss", 24, 48),
    ("equiangular", 25, 48),
])
def test_analysis_stacked_matches_call(grid, nlat, nlon):
    lmax, mmax = nlat // 2, nlon // 4 + 1
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, nlat, nlon).astype(np.float32))

    ref = sht(x)
    sht_lib.set_coeff_engine("stacked")
    got = _stacked_to_complex(sht.analysis_stacked(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("grid,nlat,nlon", [
    ("legendre-gauss", 24, 48),
    ("equiangular", 25, 48),
])
def test_synthesis_stacked_matches_call(grid, nlat, nlon):
    lmax, mmax = nlat // 2, nlon // 4 + 1
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    rng = np.random.RandomState(1)
    c = rng.randn(2, 3, lmax, mmax) + 1j * rng.randn(2, 3, lmax, mmax)
    c = jnp.asarray(c.astype(np.complex64))

    ref = isht(c)
    sht_lib.set_coeff_engine("stacked")
    zs = jnp.concatenate([jnp.moveaxis(jnp.real(c), -1, 0),
                          jnp.moveaxis(jnp.imag(c), -1, 0)], axis=0)
    got = isht.synthesis_stacked(zs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale_factor", [1, 2])
def test_spectral_conv_stacked_engine_matches_complex(scale_factor):
    """SpectralConv dhconv forward, residual and parameter/input gradients are
    engine-independent (complex-XLA vs stacked-XLA layouts)."""
    from makani_tpu.models.common.spectral_convolution import SpectralConv

    nlat, nlon = 24, 48
    nlat_i, nlon_i = nlat // scale_factor, nlon // scale_factor
    lmax, mmax = nlat_i // 2, nlon_i // 4 + 1
    fwd_t = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss")
    inv_t = InverseRealSHT(nlat_i, nlon_i, lmax=lmax, mmax=mmax, grid="legendre-gauss")

    conv = SpectralConv(forward_transform=fwd_t, inverse_transform=inv_t,
                        in_channels=6, out_channels=6, operator_type="dhconv",
                        bias="constant")
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, nlat, nlon).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(p, v):
        out, res = conv.apply(p, v)
        return jnp.sum(out ** 2) + jnp.sum(res ** 2), (out, res)

    sht_lib.set_coeff_engine("xla")
    (l_ref, (out_ref, res_ref)), g_ref = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(params, x)

    sht_lib.set_coeff_engine("stacked")
    (l_st, (out_st, res_st)), g_st = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(params, x)

    np.testing.assert_allclose(np.asarray(out_st), np.asarray(out_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_st), np.asarray(res_ref), rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_st), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-5 * max(1.0, float(jnp.abs(b).max())))


def test_sfno_stacked_engine_matches_complex():
    """Tiny SFNO train-step gradient is engine-independent (exercises the
    stacked pipeline under remat, scale-changing first/last blocks, big_skip
    and instance norm)."""
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(18, 36), out_shape=(18, 36), scale_factor=2,
        inp_chans=4, out_chans=4, embed_dim=16, num_layers=2,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, big_skip=True, checkpointing=2)

    x = jnp.asarray(np.random.RandomState(5).randn(1, 4, 18, 36).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(6).randn(1, 4, 18, 36).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, v):
        pred = model.apply({"params": p}, v)
        return jnp.mean((pred - y) ** 2)

    sht_lib.set_coeff_engine("xla")
    l_ref, g_ref = jax.value_and_grad(loss)(params, x)
    sht_lib.set_coeff_engine("stacked")
    l_st, g_st = jax.value_and_grad(loss)(params, x)

    np.testing.assert_allclose(float(l_st), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_st), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5 * max(1.0, float(jnp.abs(b).max())))


def test_legdot_vjp_matches_einsum(monkeypatch):
    """Interpret-mode Pallas legdot: value + input cotangent == jax.grad of
    the m-batched einsum (table cotangent is defined as zero — tables are
    precomputed constants)."""
    from makani_tpu.ops import pallas_mm

    M, C, K, L = 4, 8, 16, 12
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(2 * M, C, K).astype(np.float32))
    p = jnp.asarray(rng.randn(M, L, K).astype(np.float32))

    def ref_fn(zz):
        zzs = zz.reshape(2, M, C, K)
        return jnp.sum(jnp.einsum("smck,mlk->smcl", zzs, p) ** 2)

    def pallas_fn(zz):
        return jnp.sum(pallas_mm.legdot(zz, p, "k", 3, True) ** 2)

    v_ref, g_ref = jax.value_and_grad(ref_fn)(z)
    v_pl, g_pl = jax.value_and_grad(pallas_fn)(z)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_dhconv_vjp_matches_einsum():
    """Interpret-mode Pallas dhconv custom VJP == jax.grad of the stacked
    einsum twin for both operands."""
    from makani_tpu.ops import pallas_mm

    B, L, C, O, M = 2, 4, 8, 8, 128
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, B, L, C, M).astype(np.float32))
    w = jnp.asarray(rng.randn(2, L, C, O).astype(np.float32))

    def ref_fn(xx, ww):
        eq = "blcm,lco->blom"
        re = jnp.einsum(eq, xx[0], ww[0]) - jnp.einsum(eq, xx[1], ww[1])
        im = jnp.einsum(eq, xx[0], ww[1]) + jnp.einsum(eq, xx[1], ww[0])
        out = jnp.stack([re, im])
        return jnp.sum(out ** 2 + out)

    def pallas_fn(xx, ww):
        out = pallas_mm.dhconv(xx, ww, 3, True)
        return jnp.sum(out ** 2 + out)

    v_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1))(x, w)
    v_pl, g_pl = jax.value_and_grad(pallas_fn, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=1e-4)
    for a, b in zip(g_pl, g_ref):
        # 3-pass bf16 vs exact f32: ~1e-5 relative except under cancellation
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5 * scale)
