"""SHT correctness: round trips, orthonormality, analytic spherical harmonics.

Mirrors the reference test strategy of validating spectral transforms against
independent references (ref: SURVEY.md §4; tests/distributed/tests_fft.py uses
serial-vs-distributed allclose, here we first pin the serial transform to
scipy's analytic spherical harmonics).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from scipy.special import sph_harm_y

from makani_tpu.ops import RealSHT, InverseRealSHT, RealFFT2, InverseRealFFT2
from makani_tpu.ops.quadrature import quadrature_nodes_weights


@pytest.mark.parametrize("grid,nlat,nlon", [
    ("legendre-gauss", 32, 64),
    ("equiangular", 33, 64),
    ("legendre-gauss", 17, 36),
])
def test_sht_roundtrip_bandlimited(grid, nlat, nlon):
    """isht(sht(x)) == x for band-limited x."""
    lmax = nlat if grid == "legendre-gauss" else nlat - 1
    mmax = nlon // 2 + 1
    sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
    isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)

    # create band-limited data by synthesizing random coefficients
    rng = np.random.RandomState(0)
    coeffs = rng.randn(2, 3, lmax, mmax) + 1j * rng.randn(2, 3, lmax, mmax)
    # zero out l < m (invalid) and halve bandwidth to be safely resolvable
    l_idx = np.arange(lmax)[:, None]
    m_idx = np.arange(mmax)[None, :]
    mask = (l_idx >= m_idx) & (l_idx < lmax // 2)
    coeffs = coeffs * mask
    coeffs[..., 0] = coeffs[..., 0].real  # m=0 must be real for a real signal
    coeffs = jnp.asarray(coeffs.astype(np.complex64))

    x = isht(coeffs)
    c2 = sht(x)
    # analysis of synthesized field must give back the band-limited coefficients
    # (on equiangular/CC grids analysis aliases into l >= lmax/2, so compare in-band)
    np.testing.assert_allclose(np.asarray(c2 * mask), np.asarray(coeffs), rtol=2e-3, atol=2e-4)
    x2 = isht(jnp.asarray(np.asarray(c2) * mask))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-4, atol=2e-4 * float(jnp.abs(x).max()))


def test_sht_matches_scipy_spherical_harmonics():
    """Analysis of an analytic Y_lm gives a delta at (l, m)."""
    nlat, nlon = 24, 48
    sht = RealSHT(nlat, nlon, grid="legendre-gauss")

    cost, _ = quadrature_nodes_weights("legendre-gauss", nlat)
    theta = np.flip(np.arccos(cost))  # 0..pi
    phi = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")

    for (l, m) in [(0, 0), (3, 0), (5, 2), (7, 7)]:
        # real part of scipy's Y_lm (includes Condon-Shortley phase)
        ylm = sph_harm_y(l, m, tt, pp)
        field = np.real(ylm).astype(np.float32)
        coeffs = np.asarray(sht(jnp.asarray(field[None])))[0]
        expected = np.zeros_like(coeffs)
        # real(Y_lm) = (Y_lm + conj(Y_lm))/2 -> c_lm = 1/2 for m>0, 1 for m=0
        expected[l, m] = 1.0 if m == 0 else 0.5
        np.testing.assert_allclose(coeffs, expected, atol=1e-4)


def test_sht_constant_field():
    """A constant field has only the (0,0) coefficient = c*sqrt(4pi)."""
    nlat, nlon = 16, 32
    for grid in ["legendre-gauss", "equiangular"]:
        sht = RealSHT(nlat, nlon, grid=grid)
        x = jnp.ones((1, nlat, nlon))
        c = np.array(sht(x))[0]
        np.testing.assert_allclose(c[0, 0].real, np.sqrt(4 * np.pi), rtol=1e-5)
        c[0, 0] = 0.0
        np.testing.assert_allclose(c, 0.0, atol=1e-4)


def test_sht_parseval():
    """Quadrature integral of x^2 equals sum of |c_lm|^2 (with m>0 doubled)."""
    nlat, nlon = 32, 64
    sht = RealSHT(nlat, nlon, grid="legendre-gauss")
    isht = InverseRealSHT(nlat, nlon, grid="legendre-gauss")

    rng = np.random.RandomState(1)
    coeffs = np.zeros((nlat, nlon // 2 + 1), dtype=np.complex64)
    l_idx = np.arange(nlat)[:, None]
    m_idx = np.arange(nlon // 2 + 1)[None, :]
    mask = (l_idx >= m_idx) & (l_idx < nlat - 2)
    coeffs[mask] = (rng.randn(mask.sum()) + 1j * rng.randn(mask.sum())).astype(np.complex64)
    coeffs[:, 0] = coeffs[:, 0].real
    x = isht(jnp.asarray(coeffs[None]))

    cost, w = quadrature_nodes_weights("legendre-gauss", nlat)
    wq = np.flip(w)
    integral = (2 * np.pi / nlon) * np.sum(np.asarray(x[0]) ** 2 * wq[:, None])

    c = np.asarray(coeffs)
    spec = np.sum(np.abs(c[:, 0]) ** 2) + 2 * np.sum(np.abs(c[:, 1:]) ** 2)
    np.testing.assert_allclose(integral, spec, rtol=1e-3)


@pytest.mark.parametrize("nlat,nlon,lmax,mmax", [
    (32, 64, 32, 33),
    (32, 64, 16, 17),   # truncated
    (33, 64, 20, 21),   # odd nlat, truncated
])
def test_fft2_roundtrip(nlat, nlon, lmax, mmax):
    fft = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
    ifft = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, nlat, nlon).astype(np.float32))
    y = fft(x)
    assert y.shape == (2, 3, lmax, mmax)
    x2 = ifft(y)
    assert x2.shape == (2, 3, nlat, nlon)

    if lmax == nlat and mmax == nlon // 2 + 1:
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
    else:
        # truncation/inversion is idempotent on the band-limited subspace,
        # excluding the unpaired negative lat-frequency at m=0 (its +freq
        # partner is truncated away, so synthesis splits its energy; the
        # reference wrapper shares this edge behavior).
        yb = np.array(y)
        yb[..., fft.lmax_high, 0] = 0.0
        xb = ifft(jnp.asarray(yb))
        y2 = np.array(fft(xb))
        np.testing.assert_allclose(y2, yb, rtol=1e-4, atol=1e-5)


def test_fft3_roundtrip():
    from makani_tpu.ops.fft3d import RealFFT3, InverseRealFFT3

    nd, nh, nw = 8, 16, 32
    fft = RealFFT3(nd, nh, nw)
    ifft = InverseRealFFT3(nd, nh, nw)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 3, nd, nh, nw).astype(np.float32))
    y = fft(x)
    assert y.shape == (2, 3, nd, nh, nw // 2 + 1)
    x2 = ifft(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)

    # truncated: cross-check the slicing against an independent numpy replica
    fft_t = RealFFT3(nd, nh, nw, ldmax=4, lhmax=8, lwmax=9)
    y_t = np.asarray(fft_t(x))
    ref = np.fft.rfftn(np.asarray(x), axes=(-3, -2, -1), norm="ortho")
    ref = np.concatenate((ref[..., :2, :, :], ref[..., -2:, :, :]), axis=-3)
    ref = np.concatenate((ref[..., :4, :], ref[..., -4:, :]), axis=-2)
    ref = ref[..., :9]
    np.testing.assert_allclose(y_t, ref, rtol=1e-4, atol=1e-5)


def test_device_tables_match_host():
    """In-graph (extended-range f32) tables vs host f64 tables."""
    import jax
    from makani_tpu.ops.device_tables import legpoly_device, rdft_device, irdft_device
    from makani_tpu.ops.legendre import precompute_legpoly
    from makani_tpu.ops.dft import rdft_matrices, irdft_matrices
    from makani_tpu.ops.sht import _theta_weights

    for (grid, nlat, lmax, mmax) in [("legendre-gauss", 32, 32, 17), ("equiangular", 181, 60, 61)]:
        tq, _ = _theta_weights(grid, nlat)
        host = precompute_legpoly(mmax, lmax, tq, norm="ortho", csphase=True)
        dev = np.asarray(jax.jit(lambda tq=tq: legpoly_device(mmax, lmax, tuple(tq)))())
        assert np.abs(dev - host).max() < 5e-4, f"{grid} {nlat}"

    C, S = rdft_matrices(64, 17, "integral")
    Cd, Sd = jax.jit(lambda: rdft_device(64, 17, "integral"))()
    np.testing.assert_allclose(np.asarray(Cd), C, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Sd), S, atol=1e-5)
    Cs, Ss = irdft_matrices(64, 17, "synthesis")
    Csd, Ssd = jax.jit(lambda: irdft_device(64, 17, "synthesis"))()
    np.testing.assert_allclose(np.asarray(Csd), Cs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ssd), Ss, atol=1e-4)


def test_sht_roundtrip_with_device_tables():
    """Full SHT roundtrip using the in-graph tables (as on TPU)."""
    import jax
    from makani_tpu.ops import sht as sht_mod

    sht_mod.set_table_mode("device")
    try:
        nlat, nlon = 32, 64
        sht = RealSHT(nlat, nlon, grid="legendre-gauss")
        isht = InverseRealSHT(nlat, nlon, grid="legendre-gauss")
        rng = np.random.RandomState(7)
        coeffs = np.zeros((nlat, nlon // 2 + 1), dtype=np.complex64)
        l_idx = np.arange(nlat)[:, None]
        m_idx = np.arange(nlon // 2 + 1)[None, :]
        mask = (l_idx >= m_idx) & (l_idx < nlat // 2)
        coeffs[mask] = (rng.randn(mask.sum()) + 1j * rng.randn(mask.sum())).astype(np.complex64)
        coeffs[:, 0] = coeffs[:, 0].real
        x = jax.jit(lambda c: isht(c))(jnp.asarray(coeffs[None]))
        c2 = np.asarray(jax.jit(lambda v: sht(v))(x))[0] * mask
        np.testing.assert_allclose(c2, coeffs, rtol=1e-3, atol=2e-4)
    finally:
        sht_mod.set_table_mode("auto")


def test_transform_precision_modes_roundtrip():
    """All documented precision modes ('default'/'split2'/'mixed'/'tf32'/
    'high'/'highest') produce a consistent SHT roundtrip. On CPU the 1-pass
    branches keep f32 activations exact, so every mode sits at f32 tolerance;
    the on-chip accuracy ladder is measured by scripts/precision_study.py."""
    import numpy as np
    import jax.numpy as jnp
    from makani_tpu.ops import sht as sht_mod
    from makani_tpu.ops import RealSHT, InverseRealSHT

    nlat, nlon = 24, 48
    lmax = mmax = nlat // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, nlat, nlon).astype(np.float32))

    fwd = RealSHT(nlat, nlon, lmax, mmax, grid="legendre-gauss")
    inv = InverseRealSHT(nlat, nlon, lmax, mmax, grid="legendre-gauss")

    # band-limit first so the roundtrip is exact up to arithmetic error
    xb = inv(fwd(x))
    ref = None
    try:
        for mode in ("default", "split2", "mixed", "tf32", "high", "highest"):
            sht_mod.set_transform_precision(mode)
            out = np.asarray(inv(fwd(xb)))
            assert np.isfinite(out).all(), mode
            if ref is None:
                ref = out
            scale = np.abs(ref).max()
            # CPU: everything is f32-exact-ish; bf16-table modes may round
            np.testing.assert_allclose(out, ref, atol=2e-2 * scale, err_msg=mode)
    finally:
        sht_mod.set_transform_precision("high")
