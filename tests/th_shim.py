"""Independent float64 torch ``torch_harmonics`` shim for reference parity.

The reference consumes torch_harmonics only as ``th.RealSHT`` /
``th.InverseRealSHT`` — lat x (l-per-m) matmul modules (ref:
makani/models/networks/sfnonet.py:502-571) — plus the quadrature helpers used
by makani/utils/grids.py. This module rebuilds exactly that surface in torch,
constructed INDEPENDENTLY of makani_tpu's own tables:

  - associated Legendre matrices from scipy.special.sph_harm_y in float64
    (orthonormal spherical harmonics, Condon-Shortley phase — the "ortho" /
    csphase=True convention both torch_harmonics and makani_tpu use),
  - Gauss-Legendre nodes/weights from numpy.polynomial.legendre.leggauss,
  - Clenshaw-Curtis weights from the classic cosine-sum formula (NOT the
    Waldvogel FFT construction makani_tpu's ops/quadrature.py uses).

Agreement between the reference SFNO running on this shim and makani_tpu's
SFNO is therefore non-circular evidence: the only shared ingredient is the
documented mathematical convention, which tests/test_sht.py pins to scipy's
analytic spherical harmonics on the makani_tpu side.

Transform semantics (the torch_harmonics "ortho" convention):
  analysis   c_lm = sum_k w_k Ybar_l^m(theta_k) * 2pi/nlon sum_j x e^{-im phi_j}
  synthesis  x(theta_k, phi_j) = Re sum_m fac_m e^{im phi_j} sum_l c_lm Ybar_l^m
with fac_m = 1 for m=0 and 2 for m>0 (via hermitian irfft), theta ascending
in [0, pi] (north pole first).
"""

import sys
import types

import numpy as np
import torch
import torch.nn as nn
from scipy.special import sph_harm_y


# ---------------------------------------------------------------------------
# quadrature (independent constructions)
# ---------------------------------------------------------------------------

def legendre_gauss_weights(n, a=-1.0, b=1.0):
    """Gauss-Legendre nodes (ascending) and weights on [a, b]."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = (b - a) * 0.5 * x + (b + a) * 0.5
    w = w * (b - a) * 0.5
    return x, w


def clenshaw_curtiss_weights(n, a=-1.0, b=1.0):
    """Clenshaw-Curtis nodes/weights on [a, b] including endpoints, via the
    classic cosine-sum formula (independent of Waldvogel's FFT method):
      theta_j = j pi / (n-1),
      w_j = (c_j/(n-1)) [1 - sum_k b_k cos(2 k theta_j) / (4k^2 - 1)].
    Nodes returned ascending in x = cos(theta)."""
    assert n > 1
    n1 = n - 1
    theta = np.pi * np.arange(n) / n1
    w = np.ones(n)
    kmax = n1 // 2
    for j in range(n):
        s = 0.0
        for k in range(1, kmax + 1):
            bk = 1.0 if 2 * k == n1 else 2.0
            s += bk * np.cos(2.0 * k * theta[j]) / (4.0 * k * k - 1.0)
        w[j] = 1.0 - s
    w = w / n1
    w[0] *= 0.5
    w[-1] *= 0.5
    w *= 2.0  # integral over [-1, 1]
    x = np.cos(theta)[::-1].copy()  # ascending in x
    w = w[::-1].copy()
    x = (b - a) * 0.5 * x + (b + a) * 0.5
    w = w * (b - a) * 0.5
    return x, w


def _theta_weights(grid, nlat):
    if grid == "legendre-gauss":
        cost, w = legendre_gauss_weights(nlat, -1.0, 1.0)
    elif grid in ("equiangular", "clenshaw-curtiss"):
        cost, w = clenshaw_curtiss_weights(nlat, -1.0, 1.0)
    else:
        raise ValueError(f"shim: unsupported grid {grid}")
    # theta ascending in [0, pi] (north pole first)
    tq = np.flip(np.arccos(cost)).copy()
    wq = np.flip(w).copy()
    return tq, wq


def _legendre_table(mmax, lmax, tq):
    """pct[m, l, k] = Ybar_l^m(theta_k) (orthonormal, CS phase), float64,
    via scipy's analytic spherical harmonics evaluated at phi=0."""
    pct = np.zeros((mmax, lmax, len(tq)))
    for m in range(mmax):
        for l in range(m, lmax):
            pct[m, l] = np.real(sph_harm_y(l, m, tq, 0.0))
    return pct


# ---------------------------------------------------------------------------
# transform modules
# ---------------------------------------------------------------------------

class RealSHT(nn.Module):
    """Analysis: real (..., nlat, nlon) -> complex (..., lmax, mmax)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="equiangular",
                 norm="ortho", csphase=True):
        super().__init__()
        assert norm == "ortho" and csphase
        self.nlat, self.nlon = nlat, nlon
        self.grid = grid
        self.lmax = lmax or nlat
        self.mmax = mmax or nlon // 2 + 1
        tq, wq = _theta_weights(grid, nlat)
        pct = _legendre_table(self.mmax, self.lmax, tq)
        weights = torch.from_numpy(pct * wq[None, None, :])
        self.register_buffer("weights", weights)

    def forward(self, x):
        assert x.shape[-2] == self.nlat and x.shape[-1] == self.nlon
        xh = 2.0 * torch.pi * torch.fft.rfft(x, dim=-1, norm="forward")
        xh = xh[..., : self.mmax]
        w = self.weights.to(torch.promote_types(x.dtype, torch.float32))
        rl = torch.einsum("...km,mlk->...lm", xh.real, w)
        im = torch.einsum("...km,mlk->...lm", xh.imag, w)
        return torch.complex(rl, im)


class InverseRealSHT(nn.Module):
    """Synthesis: complex (..., lmax, mmax) -> real (..., nlat, nlon)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="equiangular",
                 norm="ortho", csphase=True):
        super().__init__()
        assert norm == "ortho" and csphase
        self.nlat, self.nlon = nlat, nlon
        self.grid = grid
        self.lmax = lmax or nlat
        self.mmax = mmax or nlon // 2 + 1
        tq, _ = _theta_weights(grid, nlat)
        pct = _legendre_table(self.mmax, self.lmax, tq)
        self.register_buffer("pct", torch.from_numpy(pct))

    def forward(self, x):
        assert x.shape[-2] == self.lmax and x.shape[-1] == self.mmax
        w = self.pct.to(torch.promote_types(x.real.dtype, torch.float32))
        rl = torch.einsum("...lm,mlk->...km", x.real, w)
        im = torch.einsum("...lm,mlk->...km", x.imag, w)
        xh = torch.complex(rl, im)
        return torch.fft.irfft(xh, n=self.nlon, dim=-1, norm="forward")


# ---------------------------------------------------------------------------
# module installation
# ---------------------------------------------------------------------------

def install():
    """Install this shim as ``torch_harmonics`` (+ .quadrature, .distributed)
    in sys.modules, overwriting any earlier stub. Returns the module."""
    th = types.ModuleType("torch_harmonics")
    th.RealSHT = RealSHT
    th.InverseRealSHT = InverseRealSHT

    thq = types.ModuleType("torch_harmonics.quadrature")
    thq.legendre_gauss_weights = legendre_gauss_weights
    thq.clenshaw_curtiss_weights = clenshaw_curtiss_weights
    th.quadrature = thq

    thd = types.ModuleType("torch_harmonics.distributed")

    class _DistUnavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError("shim: distributed SHT not provided")

    thd.init = lambda *a, **k: None
    thd.DistributedRealSHT = _DistUnavailable
    thd.DistributedInverseRealSHT = _DistUnavailable
    thd.DistributedRealFFT2 = _DistUnavailable
    thd.DistributedInverseRealFFT2 = _DistUnavailable
    # used by reference dist-transpose helpers if ever touched
    thd.distributed_transpose_azimuth = None
    thd.distributed_transpose_polar = None
    th.distributed = thd

    sys.modules["torch_harmonics"] = th
    sys.modules["torch_harmonics.quadrature"] = thq
    sys.modules["torch_harmonics.distributed"] = thd
    return th
