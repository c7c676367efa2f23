"""AFNO v1 — the original FourCastNet backbone (NHWC tokens) + PrecipNet.

Capability parity with ref: makani/models/networks/afnonet.py:45-268. The
reference's centered high-frequency window writes into zero buffers are
expressed as static masks here (identical numerics, XLA-friendly).
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.models.common import DropPath, PatchEmbed
from makani_tpu.models.common.activations import get_activation


def _softshrink(x, lambd):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


def _trunc02(key, shape, dtype=jnp.float32):
    return 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


class MlpV1(nn.Module):
    """token MLP (NHWC last-dim dense; ref: afnonet.py:24-42)."""

    in_features: int
    hidden_features: int
    drop_rate: float = 0.0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=_trunc02, name="fc1")(x)
        x = get_activation(self.activation_function)(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.in_features, kernel_init=_trunc02, name="fc2")(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)
        return x


class AFNO2Dv1(nn.Module):
    """Blockwise spectral MLP with separate real/imag weights and the original
    centered mode window (ref: afnonet.py:45-112). Input NHWC."""

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    hidden_size_factor: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.hidden_size % self.num_blocks == 0
        block_size = self.hidden_size // self.num_blocks
        hidden = block_size * self.hidden_size_factor
        scale = 0.02

        def winit(key, shape):
            return scale * jax.random.normal(key, shape, jnp.float32)

        w1 = self.param("w1", winit, (2, self.num_blocks, block_size, hidden))
        b1 = self.param("b1", winit, (2, self.num_blocks, hidden))
        w2 = self.param("w2", winit, (2, self.num_blocks, hidden, block_size))
        b2 = self.param("b2", winit, (2, self.num_blocks, block_size))

        bias = x
        dtype = x.dtype
        x = x.astype(jnp.float32)
        B, H, W, C = x.shape

        xf = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
        xf = xf.reshape(B, H, W // 2 + 1, self.num_blocks, block_size)

        total_modes = H // 2 + 1
        kept_modes = int(total_modes * self.hard_thresholding_fraction)

        # the reference windows rows [total_modes-kept : total_modes+kept] and
        # cols [:kept]; replicate via a static mask
        kh = np.arange(H)
        keep_h = (kh >= total_modes - kept_modes) & (kh < total_modes + kept_modes)
        km = np.arange(W // 2 + 1)
        keep_m = km < kept_modes
        mask = (keep_h[:, None] & keep_m[None, :]).astype(np.float32)[None, :, :, None, None]

        xr, xi = jnp.real(xf), jnp.imag(xf)
        o1r = jax.nn.relu(
            jnp.einsum("bhwki,kio->bhwko", xr, w1[0])
            - jnp.einsum("bhwki,kio->bhwko", xi, w1[1]) + b1[0]
        )
        o1i = jax.nn.relu(
            jnp.einsum("bhwki,kio->bhwko", xi, w1[0])
            + jnp.einsum("bhwki,kio->bhwko", xr, w1[1]) + b1[1]
        )
        o1r, o1i = o1r * mask, o1i * mask
        o2r = (jnp.einsum("bhwko,koi->bhwki", o1r, w2[0])
               - jnp.einsum("bhwko,koi->bhwki", o1i, w2[1]) + b2[0])
        o2i = (jnp.einsum("bhwko,koi->bhwki", o1i, w2[0])
               + jnp.einsum("bhwko,koi->bhwki", o1r, w2[1]) + b2[1])
        o2r, o2i = o2r * mask, o2i * mask

        o2r = _softshrink(o2r, self.sparsity_threshold)
        o2i = _softshrink(o2i, self.sparsity_threshold)

        xf = jax.lax.complex(o2r, o2i).reshape(B, H, W // 2 + 1, C)
        xout = jnp.fft.irfft2(xf, s=(H, W), axes=(1, 2), norm="ortho").astype(dtype)
        return xout + bias


class BlockV1(nn.Module):
    """(ref: afnonet.py:115-152)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    double_skip: bool = True
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = AFNO2Dv1(self.dim, self.num_blocks, self.sparsity_threshold,
                     self.hard_thresholding_fraction, name="filter")(x)
        if self.double_skip:
            x = x + residual
            residual = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = MlpV1(self.dim, int(self.dim * self.mlp_ratio), self.drop_rate,
                  activation_function=self.activation_function, name="mlp")(
            x, deterministic=deterministic)
        if self.path_drop_rate > 0.0:
            x = DropPath(self.path_drop_rate, name="drop_path")(x, deterministic=deterministic)
        x = x + residual
        return x


class AdaptiveFourierNeuralOperatorNetV1(nn.Module):
    """(ref: afnonet.py:174-268)."""

    inp_shape: Tuple[int, int] = (720, 1440)
    patch_size: Tuple[int, int] = (16, 16)
    inp_chans: int = 2
    out_chans: int = 2
    embed_dim: int = 768
    num_layers: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    num_blocks: int = 16
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = self.inp_shape[0] // self.patch_size[0]
        w = self.inp_shape[1] // self.patch_size[1]
        B = x.shape[0]

        x = PatchEmbed(img_size=self.inp_shape, patch_size=self.patch_size,
                       in_chans=self.inp_chans, embed_dim=self.embed_dim,
                       name="patch_embed")(x)
        x = jnp.transpose(x, (0, 2, 1))  # B, N, C

        pe = self.param("pos_embed", _trunc02, (1, h * w, self.embed_dim))
        x = x + pe.astype(x.dtype)
        if self.drop_rate > 0.0:
            x = nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)

        x = x.reshape(B, h, w, self.embed_dim)

        dpr = np.linspace(0, self.drop_path_rate, self.num_layers)
        for i in range(self.num_layers):
            x = BlockV1(
                dim=self.embed_dim, mlp_ratio=self.mlp_ratio,
                drop_rate=self.drop_rate, path_drop_rate=float(dpr[i]),
                num_blocks=self.num_blocks,
                sparsity_threshold=self.sparsity_threshold,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                activation_function=self.activation_function,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)

        head_dim = self.out_chans * self.patch_size[0] * self.patch_size[1]
        x = nn.Dense(head_dim, use_bias=False, kernel_init=_trunc02, name="head")(x)

        # pixel shuffle with reference ordering (c last; ref: afnonet.py:262-266)
        p0, p1 = self.patch_size
        xv = x.reshape(B, h, w, p0, p1, self.out_chans)
        xvt = jnp.transpose(xv, (0, 5, 1, 3, 2, 4))
        x = xvt.reshape(B, self.out_chans, h * p0, w * p1)
        return x


class PeriodicPad2d(nn.Module):
    """Circular pad in longitude, zero pad in latitude
    (ref: makani/utils/img_utils.py PeriodicPad2d)."""

    pad_width: int = 1

    def __call__(self, x):
        p = self.pad_width
        x = jnp.concatenate([x[..., :, -p:], x, x[..., :, :p]], axis=-1)
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)))
        return x


class PrecipNet(nn.Module):
    """Backbone + periodic-pad 3x3 conv + ReLU head (ref: afnonet.py:155-171)."""

    backbone: nn.Module
    out_chans: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = self.backbone(x, deterministic=deterministic)
        x = PeriodicPad2d(1, name="ppad")(x)
        # NCHW 3x3 valid conv
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(self.out_chans, (3, 3), padding="VALID", name="conv")(x)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return jax.nn.relu(x)
