"""Truncated 2D real FFT wrappers with an SHT-like interface.

Used by the planar FNO/AFNO models. Mirrors the two-sided latitude-frequency
truncation behavior of the reference wrappers
(ref: makani/models/common/layers.py:219-287): keep the lmax_high lowest
positive and lmax_low highest (negative) frequencies along the lat axis and
the first mmax along lon; the inverse zero-pads the mid-spectrum.
"""

import math

import jax.numpy as jnp


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
        x = x.astype(jnp.float32)
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
        x = x.astype(jnp.complex64)
        xt = x[..., : self.mmax]
        if self.truncate:
            xth = xt[..., : self.lmax_high, :]
            xtl = xt[..., -self.lmax_low :, :]
            pad = [(0, 0)] * (xt.ndim - 2) + [(0, self.nlat - self.lmax), (0, 0)]
            xthp = jnp.pad(xth, pad)
            xt = jnp.concatenate([xthp, xtl], axis=-2)
        return jnp.fft.irfft2(xt, s=(self.nlat, self.nlon), axes=(-2, -1), norm="ortho")
