"""Truncated 2D real FFT wrappers with an SHT-like interface.

Used by the planar FNO/AFNO models. Mirrors the two-sided latitude-frequency
truncation behavior of the reference wrappers
(ref: makani/models/common/layers.py:219-287): keep the lmax_high lowest
positive and lmax_low highest (negative) frequencies along the lat axis and
the first mmax along lon; the inverse zero-pads the mid-spectrum.
"""

import math

import jax
import jax.numpy as jnp

from makani_tpu.ops.constants import device_constant


class RealFFT2:
    def __init__(self, nlat, nlon, lmax=None, mmax=None):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = min(lmax or self.nlat, self.nlat)
        self.mmax = min(mmax or self.nlon // 2 + 1, self.nlon // 2 + 1)

        self.truncate = not ((self.lmax == self.nlat) and (self.mmax == (self.nlon // 2 + 1)))

        self.lmax_high = math.ceil(self.lmax / 2)
        self.lmax_low = math.floor(self.lmax / 2)

    def __call__(self, x):
        from makani_tpu.parallel import spmd

        x = x.astype(jnp.float32)
        if spmd.spatial_distributed() and x.ndim == 4:
            # distributed path: truncated 1D DFT matmuls with channel<->space
            # transposes (ref: mpu/layers.py:38-102; collectives via the SPMD
            # partitioner, DFTs on the MXU)
            from makani_tpu.ops.dft import rdft_matrices, dft_matrices

            x = spmd.constrain(x, "data", ("fin", "w"), "h", None)
            C, S = map(device_constant, rdft_matrices(self.nlon, self.mmax, scale="ortho"))
            yre = jnp.einsum("...j,jm->...m", x, C)
            yim = -jnp.einsum("...j,jm->...m", x, S)
            yre = spmd.constrain(yre, "data", ("fin", "h"), None, "w")
            yim = spmd.constrain(yim, "data", ("fin", "h"), None, "w")
            # lat-axis complex DFT directly onto the kept two-sided rows
            rows = tuple(range(self.lmax_high)) + tuple(range(self.nlat - self.lmax_low, self.nlat))
            Ck, Sk = map(device_constant, dft_matrices(self.nlat, rows=rows, sign=-1, scale="ortho"))
            ore = (jnp.einsum("...km,kl->...lm", yre, Ck)
                   - jnp.einsum("...km,kl->...lm", yim, Sk))
            oim = (jnp.einsum("...km,kl->...lm", yim, Ck)
                   + jnp.einsum("...km,kl->...lm", yre, Sk))
            y = jax.lax.complex(ore, oim)
            return spmd.constrain(y, "data", "fin", "h", "w")
        y = jnp.fft.rfft2(x, s=(self.nlat, self.nlon), axes=(-2, -1), norm="ortho")
        if self.truncate:
            y = jnp.concatenate(
                (y[..., : self.lmax_high, : self.mmax], y[..., -self.lmax_low :, : self.mmax]),
                axis=-2,
            )
        return y


class InverseRealFFT2:
    def __init__(self, nlat, nlon, lmax=None, mmax=None):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = min(lmax or self.nlat, self.nlat)
        self.mmax = min(mmax or self.nlon // 2 + 1, self.nlon // 2 + 1)

        self.truncate = not ((self.lmax == self.nlat) and (self.mmax == (self.nlon // 2 + 1)))

        self.lmax_high = math.ceil(self.lmax / 2)
        self.lmax_low = math.floor(self.lmax / 2)

    def __call__(self, x):
        from makani_tpu.parallel import spmd

        x = x.astype(jnp.complex64)
        xt = x[..., : self.mmax]
        if spmd.spatial_distributed() and x.ndim == 4:
            from makani_tpu.ops.dft import irdft_matrices, dft_matrices

            # entry anchor (canonical layout, fin kept sharded): pins the
            # backward exit layout — see ops/sht.py InverseRealSHT; without
            # it the SpectralConv branch-cotangent add triggers an
            # involuntary full rematerialization in SPMD
            xt = spmd.constrain(xt, "data", "fin", "h", "w")
            xre = spmd.constrain(jnp.real(xt), "data", ("fin", "h"), None, "w")
            xim = spmd.constrain(jnp.imag(xt), "data", ("fin", "h"), None, "w")
            # inverse lat DFT: synthesize from the kept two-sided rows only
            rows = tuple(range(self.lmax_high)) + tuple(range(self.nlat - self.lmax_low, self.nlat))
            Ck, Sk = map(device_constant, dft_matrices(self.nlat, rows=rows, sign=+1, scale="ortho"))
            # matrices are (k, f): out_k = sum_f X_f e^{+i 2 pi k f / n} / sqrt(n)
            zre = (jnp.einsum("...lm,kl->...km", xre, Ck)
                   - jnp.einsum("...lm,kl->...km", xim, Sk))
            zim = (jnp.einsum("...lm,kl->...km", xim, Ck)
                   + jnp.einsum("...lm,kl->...km", xre, Sk))
            zre = spmd.constrain(zre, "data", ("fin", "w"), "h", None)
            zim = spmd.constrain(zim, "data", ("fin", "w"), "h", None)
            Cs, Ss = map(device_constant, irdft_matrices(self.nlon, self.mmax, scale="ortho"))
            out = (jnp.einsum("...m,mj->...j", zre, Cs)
                   - jnp.einsum("...m,mj->...j", zim, Ss))
            return spmd.constrain(out, "data", "fin", "h", "w")

        if self.truncate:
            xth = xt[..., : self.lmax_high, :]
            xtl = xt[..., -self.lmax_low :, :]
            pad = [(0, 0)] * (xt.ndim - 2) + [(0, self.nlat - self.lmax), (0, 0)]
            xthp = jnp.pad(xth, pad)
            xt = jnp.concatenate([xthp, xtl], axis=-2)
        return jnp.fft.irfft2(xt, s=(self.nlat, self.nlon), axes=(-2, -1), norm="ortho")
