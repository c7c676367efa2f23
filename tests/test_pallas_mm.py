"""Multi-pass Pallas matmul kernels (ops/pallas_mm.py): interpret-mode
correctness vs float64 references, including the custom-VJP cotangent rules.

These kernels carry the TF32-equivalent (3-pass bf16) numerics of the
reference's fp32-under-autocast spectral matmuls
(ref: makani/models/common/spectral_convolution.py:130-141).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.ops import pallas_mm


RNG = np.random.RandomState(7)


def test_gridmm_matches_f64():
    x = RNG.randn(300, 96).astype(np.float32)
    t = RNG.randn(96, 200).astype(np.float32)
    ref = x.astype(np.float64) @ t.astype(np.float64)
    got = np.asarray(pallas_mm.gridmm(jnp.asarray(x), jnp.asarray(t),
                                      passes=3, tr=128, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5


@pytest.mark.parametrize("contract", ["k", "l"])
def test_legmm_matches_f64(contract):
    M, C, K, L = 5, 16, 24, 24
    z = RNG.randn(2 * M, C, K).astype(np.float32)
    p = RNG.randn(M, L, K).astype(np.float32)
    got = np.asarray(pallas_mm.legmm(jnp.asarray(z), jnp.asarray(p),
                                     passes=3, contract=contract, interpret=True))
    tab = [p[g % M].astype(np.float64).T if contract == "k" else p[g % M].astype(np.float64)
           for g in range(2 * M)]
    ref = np.stack([z[g].astype(np.float64) @ tab[g] for g in range(2 * M)])
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5


def _cplx(parts):
    return parts[0].astype(np.float64) + 1j * parts[1].astype(np.float64)


@pytest.mark.parametrize("m3", [True, False])
@pytest.mark.parametrize("passes", [1, 3])
def test_dhconv_mm_fwd(passes, m3):
    B, L, C, O, M = 2, 6, 16, 24, 130
    xs = RNG.randn(2, B, L, C, M).astype(np.float32)
    ws = RNG.randn(2, L, C, O).astype(np.float32)
    got = np.asarray(pallas_mm.dhconv_mm(jnp.asarray(xs), jnp.asarray(ws),
                                         passes=passes, m3=m3, interpret=True))
    ref = np.einsum("blcm,lco->blom", _cplx(xs), _cplx(ws))
    tol = 5e-5 if passes == 3 else 5e-2
    err = max(np.abs(got[0] - ref.real).max(), np.abs(got[1] - ref.imag).max())
    assert err / np.abs(ref).max() < tol


def test_dhconv_mm_dx_dw():
    B, L, C, O, M = 2, 4, 8, 12, 64
    xs = RNG.randn(2, B, L, C, M).astype(np.float32)
    ws = RNG.randn(2, L, C, O).astype(np.float32)
    gs = RNG.randn(2, B, L, O, M).astype(np.float32)
    xc, wc, gc = _cplx(xs), _cplx(ws), _cplx(gs)

    dx = np.asarray(pallas_mm.dhconv_mm(jnp.asarray(gs), jnp.asarray(ws),
                                        passes=3, wdim=1, conj_w=True, interpret=True))
    ref = np.einsum("blom,lco->blcm", gc, wc.conj())
    assert (max(np.abs(dx[0] - ref.real).max(), np.abs(dx[1] - ref.imag).max())
            / np.abs(ref).max()) < 5e-5

    dw = np.asarray(pallas_mm.dhconv_dw(jnp.asarray(xs), jnp.asarray(gs),
                                        passes=3, interpret=True))
    refw = np.einsum("blcm,blom->lco", xc.conj(), gc)
    assert (max(np.abs(dw[0] - refw.real).max(), np.abs(dw[1] - refw.imag).max())
            / np.abs(refw).max()) < 5e-5


def test_dhconv_dw_accumulates_over_batch():
    # b is the innermost grid axis with a resident output block; check the
    # accumulation against an explicit per-b sum
    B, L, C, O, M = 3, 2, 8, 8, 128
    xs = RNG.randn(2, B, L, C, M).astype(np.float32)
    gs = RNG.randn(2, B, L, O, M).astype(np.float32)
    whole = np.asarray(pallas_mm.dhconv_dw(jnp.asarray(xs), jnp.asarray(gs),
                                           passes=3, interpret=True))
    parts = sum(np.asarray(pallas_mm.dhconv_dw(jnp.asarray(xs[:, b:b + 1]),
                                               jnp.asarray(gs[:, b:b + 1]),
                                               passes=3, interpret=True))
                for b in range(B))
    np.testing.assert_allclose(whole, parts, rtol=1e-4, atol=1e-4)
