"""Serial real spherical harmonic transforms (analysis / synthesis).

TPU-native formulation: longitudinal rFFT (XLA) + per-m Legendre matmul over
latitude (MXU). The Legendre table is precomputed on host in float64 and baked
into the jitted computation as an f32 constant.

Conventions (chosen for parity with the transforms the reference uses via
torch-harmonics; ref: makani/models/networks/sfnonet.py:523-539):
  - analysis:  c_lm = sum_k w_k P-hat_l^m(theta_k) * (2 pi / nlon) sum_j x e^{-im phi_j}
  - synthesis: x(theta_k, phi_j) = Re-sum over m of e^{im phi} sum_l c_lm P-hat_l^m
  - "ortho" normalization, Condon-Shortley phase, theta ordered 0..pi
    (north pole first, ERA5 ordering).

Forward/inverse are exact round-trips for band-limited data on legendre-gauss
grids (and on equiangular grids via Clenshaw-Curtis quadrature).
"""

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops.quadrature import quadrature_nodes_weights
from makani_tpu.ops.constants import device_constant
from makani_tpu.ops.legendre import precompute_legpoly

# Matmul precision for the spectral transforms. The reference force-fp32s all
# transforms under AMP (ref: makani/models/common/spectral_convolution.py:130-141);
# on TPU, f32 MXU passes additionally need HIGHEST precision to avoid bf16
# decomposition error in the Legendre contraction.
_PRECISION = jax.lax.Precision.HIGHEST


def _theta_weights(grid, nlat):
    cost, w = quadrature_nodes_weights(grid, nlat, -1.0, 1.0)
    # theta in [0, pi], ascending (north pole first)
    tq = np.flip(np.arccos(cost))
    wq = np.flip(w)
    return tq, wq


class RealSHT:
    """Analysis: real (..., nlat, nlon) -> complex (..., lmax, mmax)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="lobatto", csphase=True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        tq, wq = _theta_weights(grid, nlat)
        pct = precompute_legpoly(self.mmax, self.lmax, tq, norm="ortho", csphase=csphase)
        # fold quadrature weights into the Legendre table: (mmax, lmax, nlat).
        # kept as a host numpy constant: transforms may be constructed inside a
        # jit trace (lazy caches), and jnp arrays created there leak tracers.
        self.weights = np.asarray(pct * wq[None, None, :], dtype=np.float32)

    def __call__(self, x):
        from makani_tpu.parallel import spmd
        from makani_tpu.ops.dft import rdft_matrices

        x = x.astype(jnp.float32)
        if spmd.spatial_distributed() and x.ndim == 4:
            # distributed path: the reference's transpose->FFT->transpose->
            # Legendre algorithm (ref: mpu/layers.py:38-102); collectives are
            # inserted by the SPMD partitioner at the constraints, and the
            # truncated lon-DFT runs as an MXU matmul in real pairs.
            x = spmd.constrain(x, "data", ("fin", "w"), "h", None)
            C, S = map(device_constant, rdft_matrices(self.nlon, self.mmax, scale="integral"))
            re = jnp.einsum("...j,jm->...m", x, C, precision=_PRECISION)
            im = -jnp.einsum("...j,jm->...m", x, S, precision=_PRECISION)
            # polar transpose: lat local for the Legendre contraction
            re = spmd.constrain(re, "data", ("fin", "h"), None, "w")
            im = spmd.constrain(im, "data", ("fin", "h"), None, "w")
            w = device_constant(self.weights)
            ore = jnp.einsum("...km,mlk->...lm", re, w, precision=_PRECISION)
            oim = jnp.einsum("...km,mlk->...lm", im, w, precision=_PRECISION)
            out = jax.lax.complex(ore, oim)
            # final layout: l sharded over h, m sharded over w
            return spmd.constrain(out, "data", "fin", "h", "w")

        # serial path: longitudinal integral 2*pi/nlon * DFT via FFT
        xf = 2.0 * jnp.pi * jnp.fft.rfft(x, axis=-1, norm="forward")
        xf = xf[..., : self.mmax]
        # per-m Legendre matmul over latitude; real weights x complex field
        w = device_constant(self.weights)
        re = jnp.einsum("...km,mlk->...lm", jnp.real(xf), w, precision=_PRECISION)
        im = jnp.einsum("...km,mlk->...lm", jnp.imag(xf), w, precision=_PRECISION)
        return jax.lax.complex(re, im)


class InverseRealSHT:
    """Synthesis: complex (..., lmax, mmax) -> real (..., nlat, nlon)."""

    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="lobatto", csphase=True):
        self.nlat = nlat
        self.nlon = nlon
        self.grid = grid
        self.lmax = lmax or self.nlat
        self.mmax = mmax or self.nlon // 2 + 1

        tq, _ = _theta_weights(grid, nlat)
        pct = precompute_legpoly(self.mmax, self.lmax, tq, norm="ortho", inverse=True, csphase=csphase)
        self.pct = np.asarray(pct, dtype=np.float32)

    def __call__(self, x):
        from makani_tpu.parallel import spmd
        from makani_tpu.ops.dft import irdft_matrices

        x = x.astype(jnp.complex64)
        if spmd.spatial_distributed() and x.ndim == 4:
            # l local for the synthesis contraction, channels over h
            xre = spmd.constrain(jnp.real(x), "data", ("fin", "h"), None, "w")
            xim = spmd.constrain(jnp.imag(x), "data", ("fin", "h"), None, "w")
            re = jnp.einsum("...lm,mlk->...km", xre, device_constant(self.pct), precision=_PRECISION)
            im = jnp.einsum("...lm,mlk->...km", xim, device_constant(self.pct), precision=_PRECISION)
            # m local for the inverse lon transform, lat over h, channels over w
            re = spmd.constrain(re, "data", ("fin", "w"), "h", None)
            im = spmd.constrain(im, "data", ("fin", "w"), "h", None)
            Cs, Ss = map(device_constant, irdft_matrices(self.nlon, self.mmax, scale="synthesis"))
            out = (jnp.einsum("...m,mj->...j", re, Cs, precision=_PRECISION)
                   - jnp.einsum("...m,mj->...j", im, Ss, precision=_PRECISION))
            return spmd.constrain(out, "data", "fin", "h", "w")

        # synthesis over l: (..., lmax, mmax) -> (..., nlat, mmax)
        re = jnp.einsum("...lm,mlk->...km", jnp.real(x), device_constant(self.pct), precision=_PRECISION)
        im = jnp.einsum("...lm,mlk->...km", jnp.imag(x), device_constant(self.pct), precision=_PRECISION)
        xs = jax.lax.complex(re, im)
        # irfft sums the +/-m pairs (Hermitian symmetry); zero-pads m -> nlon//2+1
        return jnp.fft.irfft(xs, n=self.nlon, axis=-1, norm="forward")
