"""Adaptive FNO v2 (NCHW, block-diagonal complex spectral MLP).

Capability parity with ref: makani/models/networks/afnonet_v2.py:50-314.
TPU-first formulation: the reference's zero-buffer + windowed-slice writes
become static mode masks (XLA-fusable, no dynamic-shape scatter), and the
blockwise complex MLP is expressed as complex einsums over real-pair weights.
"""

import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.models.common import DropPath, MLP, PatchEmbed, InstanceNorm2d
from makani_tpu.models.common.layers import Conv1x1, normal_init
from makani_tpu.ops.complex_ops import view_as_complex
from makani_tpu.models.common.activations import get_activation


def _softshrink(x, lambd):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


def _trunc02(key, shape, dtype=jnp.float32):
    return 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


class AFNO2Dv2(nn.Module):
    """Blockwise complex spectral MLP with hard mode threshold + softshrink
    (ref: afnonet_v2.py:50-112)."""

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.0
    hard_thresholding_fraction: float = 1.0
    hidden_size_factor: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.hidden_size % self.num_blocks == 0
        block_size = self.hidden_size // self.num_blocks
        scale = 0.02

        def winit(key, shape):
            return scale * jax.random.normal(key, shape, jnp.float32)

        w1 = view_as_complex(self.param(
            "w1", winit, (self.num_blocks, block_size, block_size * self.hidden_size_factor, 2)))
        b1 = self.param("b1", winit, (1, self.num_blocks * block_size, 1, 1))
        w2 = view_as_complex(self.param(
            "w2", winit, (self.num_blocks, block_size * self.hidden_size_factor, block_size, 2)))

        bias = x
        dtype = x.dtype
        x = x.astype(jnp.float32)
        B, C, H, W = x.shape

        total_modes_H = H // 2 + 1
        total_modes_W = W // 2 + 1
        kept_modes_H = int(total_modes_H * self.hard_thresholding_fraction)
        kept_modes_W = int(total_modes_W * self.hard_thresholding_fraction)

        xf = jnp.fft.rfft2(x, axes=(-2, -1), norm="ortho")
        xf = xf.reshape(B, self.num_blocks, block_size, H, W // 2 + 1)

        # blockwise complex MLP with cartesian ReLU
        o1 = jnp.einsum("bkihw,kio->bkohw", xf, w1)
        o1 = jax.lax.complex(jax.nn.relu(jnp.real(o1)), jax.nn.relu(jnp.imag(o1)))
        o2 = jnp.einsum("bkohw,koi->bkihw", o1, w2)

        # static mode mask: keep two-sided low lat-frequencies, low lon modes
        # (replaces the reference's zero-buffer windowed writes)
        kh = np.arange(H)
        keep_h = (kh < kept_modes_H) | (kh >= H - kept_modes_H) if kept_modes_H < total_modes_H else np.ones(H, bool)
        km = np.arange(W // 2 + 1)
        keep_m = km < kept_modes_W
        mask = (keep_h[:, None] & keep_m[None, :]).astype(np.float32)
        o2 = o2 * mask

        # softshrink on real pairs
        o2 = jax.lax.complex(
            _softshrink(jnp.real(o2), self.sparsity_threshold),
            _softshrink(jnp.imag(o2), self.sparsity_threshold),
        )

        o2 = o2.reshape(B, C, H, W // 2 + 1)
        xout = jnp.fft.irfft2(o2, s=(H, W), axes=(-2, -1), norm="ortho").astype(dtype)

        return xout + b1.astype(dtype) + bias


class BlockV2(nn.Module):
    """norm1 -> AFNO filter -> skip -> norm2 -> MLP -> drop_path -> residual
    (ref: afnonet_v2.py:115-187)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    norm_layer: str = "instance_norm"
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    skip_fno: str = "linear"
    nested_skip_fno: bool = True
    checkpointing: int = 0
    activation_function: str = "gelu"

    def _norm(self, name):
        if self.norm_layer == "instance_norm":
            return InstanceNorm2d(num_features=self.dim, eps=1e-6, affine=True, name=name)
        elif self.norm_layer == "layer_norm":
            # reference normalizes over the (h, w) axes with elementwise
            # (h, w) affine (ref: afnonet_v2.py:239-240)
            return LayerNormHW(eps=1e-6, name=name)
        raise NotImplementedError(f"Error, normalization {self.norm_layer} not implemented.")

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = self._norm("norm1")(x)
        x = AFNO2Dv2(
            self.dim, self.num_blocks, self.sparsity_threshold,
            self.hard_thresholding_fraction, name="filter",
        )(x)

        if self.skip_fno == "linear":
            w = self.param("skip_weight", _trunc02, (self.dim, self.dim))
            b = self.param("skip_bias", nn.initializers.zeros, (self.dim,))
            x = x + jnp.einsum("bchw,oc->bohw", residual, w.astype(x.dtype)) + b.astype(x.dtype)[None, :, None, None]
            if not self.nested_skip_fno:
                residual = x
        elif self.skip_fno == "identity":
            x = x + residual
            if not self.nested_skip_fno:
                residual = x

        x = self._norm("norm2")(x)
        x = MLP(
            in_features=self.dim,
            hidden_features=int(self.dim * self.mlp_ratio),
            act_layer=get_activation(self.activation_function),
            drop_rate=self.drop_rate,
            checkpointing=self.checkpointing,
            name="mlp",
        )(x, deterministic=deterministic)
        if self.path_drop_rate > 0.0:
            x = DropPath(self.path_drop_rate, name="drop_path")(x, deterministic=deterministic)
        x = x + residual
        return x


class LayerNormHW(nn.Module):
    """LayerNorm over the trailing (H, W) axes with elementwise (H, W)
    affine — torch nn.LayerNorm(normalized_shape=(h, w)) semantics."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, x.shape[-2:])
        b = self.param("bias", nn.initializers.zeros, x.shape[-2:])
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class AdaptiveFourierNeuralOperatorNet(nn.Module):
    """AFNO v2 backbone: patch embed -> AFNO blocks -> pixel-shuffle head
    (ref: afnonet_v2.py:190-314)."""

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
    normalization_layer: str = "instance_norm"
    skip_fno: str = "linear"
    nested_skip_fno: bool = True
    hard_thresholding_fraction: float = 1.0
    checkpointing: int = 0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        assert (self.inp_shape[0] % self.patch_size[0] == 0) and (self.inp_shape[1] % self.patch_size[1] == 0), (
            f"Error, the patch size {self.patch_size} does not divide the image dimensions {self.inp_shape} evenly."
        )
        h = self.inp_shape[0] // self.patch_size[0]
        w = self.inp_shape[1] // self.patch_size[1]
        B = x.shape[0]

        x = PatchEmbed(
            img_size=self.inp_shape, patch_size=self.patch_size,
            in_chans=self.inp_chans, embed_dim=self.embed_dim, name="patch_embed",
        )(x)

        pe = self.param("pos_embed", _trunc02, (1, self.embed_dim, h * w))
        x = x + pe.astype(x.dtype)
        if self.drop_rate > 0.0:
            x = nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)

        x = x.reshape(B, self.embed_dim, h, w)

        dpr = np.linspace(0, self.drop_path_rate, self.num_layers)
        for i in range(self.num_layers):
            x = BlockV2(
                dim=self.embed_dim,
                mlp_ratio=self.mlp_ratio,
                drop_rate=self.drop_rate,
                path_drop_rate=float(dpr[i]),
                norm_layer=self.normalization_layer,
                num_blocks=self.num_blocks,
                sparsity_threshold=self.sparsity_threshold,
                hard_thresholding_fraction=self.hard_thresholding_fraction,
                skip_fno=self.skip_fno,
                nested_skip_fno=self.nested_skip_fno,
                checkpointing=self.checkpointing,
                activation_function=self.activation_function,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)

        # head: 1x1 conv to (out_chans * p0 * p1), then pixel-shuffle with the
        # reference's channel ordering (p0, p1, c) (ref: afnonet_v2.py:304-313)
        head_dim = self.out_chans * self.patch_size[0] * self.patch_size[1]
        hw = self.param("head_weight", _trunc02, (head_dim, self.embed_dim))
        x = jnp.einsum("bchw,oc->bohw", x, hw.astype(x.dtype))

        p0, p1 = self.patch_size
        xv = x.reshape(B, p0, p1, self.out_chans, h, w)
        xvt = jnp.transpose(xv, (0, 3, 4, 1, 5, 2))
        x = xvt.reshape(B, self.out_chans, h * p0, w * p1)
        return x
