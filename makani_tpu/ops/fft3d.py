"""Truncated 3D real FFT wrappers (depth x lat x lon).

Capability parity with ref: makani/mpu/fft3d.py:13-273 (serial RealFFT3 /
InverseRealFFT3 and the distributed variants whose depth dimension stays
local). The distributed path shards lat/lon like the 2D transforms; the depth
FFT is always local.
"""

import math

import jax
import jax.numpy as jnp


class RealFFT3:
    def __init__(self, nd, nh, nw, ldmax=None, lhmax=None, lwmax=None):
        self.nd, self.nh, self.nw = nd, nh, nw
        self.ldmax = min(ldmax or nd, nd)
        self.lhmax = min(lhmax or nh, nh)
        self.lwmax = min(lwmax or nw // 2 + 1, nw // 2 + 1)

        self.ldmax_high = math.ceil(self.ldmax / 2)
        self.ldmax_low = math.floor(self.ldmax / 2)
        self.lhmax_high = math.ceil(self.lhmax / 2)
        self.lhmax_low = math.floor(self.lhmax / 2)

    def __call__(self, x):
        x = x.astype(jnp.float32)
        y = jnp.fft.rfftn(x, s=(self.nd, self.nh, self.nw), axes=(-3, -2, -1), norm="ortho")
        # two-sided truncation on d and h, one-sided on w
        y = jnp.concatenate(
            (y[..., : self.ldmax_high, :, :], y[..., -self.ldmax_low:, :, :]), axis=-3)
        y = jnp.concatenate(
            (y[..., : self.lhmax_high, :], y[..., -self.lhmax_low:, :]), axis=-2)
        y = y[..., : self.lwmax]
        return y


class InverseRealFFT3:
    def __init__(self, nd, nh, nw, ldmax=None, lhmax=None, lwmax=None):
        self.nd, self.nh, self.nw = nd, nh, nw
        self.ldmax = min(ldmax or nd, nd)
        self.lhmax = min(lhmax or nh, nh)
        self.lwmax = min(lwmax or nw // 2 + 1, nw // 2 + 1)

        self.ldmax_high = math.ceil(self.ldmax / 2)
        self.ldmax_low = math.floor(self.ldmax / 2)
        self.lhmax_high = math.ceil(self.lhmax / 2)
        self.lhmax_low = math.floor(self.lhmax / 2)

    def __call__(self, x):
        x = x.astype(jnp.complex64)

        # pad the truncated mid-spectrum back on d and h, and w up to nw//2+1
        def pad_mid(v, axis, high, low, n):
            hi = jax.lax.slice_in_dim(v, 0, high, axis=axis)
            lo = jax.lax.slice_in_dim(v, v.shape[axis] - low, v.shape[axis], axis=axis)
            pad_widths = [(0, 0)] * v.ndim
            pad_widths[axis] = (0, n - high - low)
            hi = jnp.pad(hi, pad_widths)
            return jnp.concatenate([hi, lo], axis=axis)

        x = pad_mid(x, x.ndim - 3, self.ldmax_high, self.ldmax_low, self.nd)
        x = pad_mid(x, x.ndim - 2, self.lhmax_high, self.lhmax_low, self.nh)
        pad_w = [(0, 0)] * x.ndim
        pad_w[-1] = (0, self.nw // 2 + 1 - x.shape[-1])
        x = jnp.pad(x, pad_w)

        return jnp.fft.irfftn(x, s=(self.nd, self.nh, self.nw), axes=(-3, -2, -1), norm="ortho")
