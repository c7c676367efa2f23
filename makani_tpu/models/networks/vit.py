"""Vision Transformer over spatial patches with a linear reconstruction head.

Capability parity with ref: makani/models/networks/vit.py:14-231. Attention is
a plain batched einsum softmax attention (XLA fuses this well on TPU; a Pallas
flash kernel slots in at Attention.__call__ for long token counts).
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.models.common import DropPath, PatchEmbed
from makani_tpu.models.common.attention import scaled_dot_product_attention
from makani_tpu.models.common.activations import get_activation


def _trunc02(key, shape, dtype=jnp.float32):
    return 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


class Attention(nn.Module):
    """Multi-head self-attention (ref: vit.py:14-55)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        assert C % self.num_heads == 0, "dim should be divisible by num_heads"
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=_trunc02, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # B, N, H, D

        if self.attn_drop_rate > 0.0 and not deterministic:
            # dropout on attention probabilities requires the materialized
            # matrix — only shipped configs with attn_drop>0 pay the O(N^2)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(rate=self.attn_drop_rate)(attn, deterministic=deterministic)
            y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        else:
            # fused memory-efficient attention (the reference rides torch
            # F.scaled_dot_product_attention, ref: makani/mpu/layers.py:512):
            # O(N*block) memory makes the 0.25-degree 16k-token ViT feasible
            q, k, v = (jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v))
            y = scaled_dot_product_attention(q, k, v, scale=scale)
            y = jnp.transpose(y, (0, 2, 1, 3)).reshape(B, N, C)

        y = nn.Dense(C, kernel_init=_trunc02, name="proj")(y)
        if self.proj_drop_rate > 0.0:
            y = nn.Dropout(rate=self.proj_drop_rate)(y, deterministic=deterministic)
        return y


class ViTBlock(nn.Module):
    """(ref: vit.py:58-120 — note the reference applies norm2 to x before both
    the residual branch and the MLP; replicated exactly)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    mlp_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop_path = (lambda v: v)
        if self.path_drop_rate > 0.0:
            dp = DropPath(self.path_drop_rate, name="drop_path")
            drop_path = lambda v: dp(v, deterministic=deterministic)

        y = Attention(self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                      attn_drop_rate=self.attn_drop_rate,
                      proj_drop_rate=self.mlp_drop_rate, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), deterministic=deterministic)
        x = x + drop_path(y)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)

        h = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_trunc02, name="mlp_fc1")(x)
        h = get_activation(self.activation_function)(h)
        if self.mlp_drop_rate > 0.0:
            h = nn.Dropout(rate=self.mlp_drop_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, kernel_init=_trunc02, name="mlp_fc2")(h)
        if self.mlp_drop_rate > 0.0:
            h = nn.Dropout(rate=self.mlp_drop_rate)(h, deterministic=deterministic)
        x = x + drop_path(h)
        return x


class VisionTransformer(nn.Module):
    """(ref: vit.py:123-231)."""

    inp_shape: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    inp_chans: int = 3
    out_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    mlp_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    path_drop_rate: float = 0.0
    activation_function: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        gh = self.inp_shape[0] // self.patch_size[0]
        gw = self.inp_shape[1] // self.patch_size[1]
        B = x.shape[0]

        x = PatchEmbed(img_size=self.inp_shape, patch_size=self.patch_size,
                       in_chans=self.inp_chans, embed_dim=self.embed_dim,
                       name="patch_embed")(x)
        x = jnp.transpose(x, (0, 2, 1))  # B, N, C

        pe = self.param("pos_embed", _trunc02, (1, gh * gw, self.embed_dim))
        x = x + pe.astype(x.dtype)
        if self.path_drop_rate > 0.0:
            x = nn.Dropout(rate=self.path_drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, self.path_drop_rate, self.depth)
        for i in range(self.depth):
            x = ViTBlock(
                dim=self.embed_dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, mlp_drop_rate=self.mlp_drop_rate,
                attn_drop_rate=self.attn_drop_rate, path_drop_rate=float(dpr[i]),
                activation_function=self.activation_function,
                name=f"blocks_{i}",
            )(x, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        # head + depatchify (ref: vit.py:211-222)
        x = x.reshape(B, gh, gw, self.embed_dim)
        x = nn.Dense(self.out_chans * self.patch_size[0] * self.patch_size[1],
                     use_bias=False, kernel_init=_trunc02, name="head")(x)
        x = x.reshape(B, gh, gw, self.patch_size[0], self.patch_size[1], self.out_chans)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        x = x.reshape(B, self.out_chans, self.inp_shape[0], self.inp_shape[1])
        return x
