"""Core building-block layers (flax.linen), NCHW layout.

Capability parity with the reference blocks (ref: makani/models/common/layers.py:35-216)
but TPU-first: 1x1 "convs" are expressed as channel einsums (pure MXU matmuls),
patch embedding as a reshape+einsum (no im2col), norms as explicit reductions
XLA fuses into neighbors.

Initialization follows the reference convention: W ~ N(0, sqrt(gain/fan_in)),
zero biases.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class Conv1x1(nn.Module):
    """Channel-mixing linear layer on NCHW tensors (a 1x1 convolution).

    On TPU this is a single MXU matmul over the channel dimension.
    """

    in_features: int
    out_features: int
    use_bias: bool = True
    gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        std = (self.gain / self.in_features) ** 0.5
        w = self.param("weight", normal_init(std), (self.out_features, self.in_features))
        y = jnp.einsum("bchw,oc->bohw", x, w.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_features,))
            y = y + b.astype(x.dtype)[None, :, None, None]
        return y


class DropPath(nn.Module):
    """Stochastic depth per sample (ref: makani/models/common/layers.py:35-62)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=jnp.float32))
        return (x / keep_prob) * mask.astype(x.dtype)


class MLP(nn.Module):
    """Two-layer channel MLP on NCHW tensors
    (ref: makani/models/common/layers.py:136-216)."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    act_layer: Callable = jax.nn.gelu
    output_bias: bool = True
    drop_rate: float = 0.0
    drop_type: str = "iid"
    gain: float = 1.0
    checkpointing: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or self.in_features
        hidden_features = self.hidden_features or self.in_features

        def body(mdl, x):
            x = Conv1x1(mdl.in_features, hidden_features, use_bias=True, gain=2.0, name="fc1")(x)
            x = mdl.act_layer(x)
            x = mdl._drop(x, deterministic)
            x = Conv1x1(hidden_features, out_features, use_bias=mdl.output_bias, gain=mdl.gain, name="fc2")(x)
            x = mdl._drop(x, deterministic)
            return x

        if self.checkpointing >= 2:
            body = nn.remat(body, prevent_cse=False)
        return body(self, x)

    def _drop(self, x, deterministic):
        if self.drop_rate == 0.0:
            return x
        if self.drop_type == "iid":
            return nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)
        elif self.drop_type == "features":
            # drop whole feature maps (Dropout2d equivalent for NCHW)
            return nn.Dropout(rate=self.drop_rate, broadcast_dims=(2, 3))(x, deterministic=deterministic)
        raise NotImplementedError(f"Error, drop_type {self.drop_type} not supported")


class EncoderDecoder(nn.Module):
    """Stack of 1x1-conv + activation layers
    (ref: makani/models/common/layers.py:86-133)."""

    num_layers: int
    input_dim: int
    output_dim: int
    hidden_dim: int
    act_layer: Callable = jax.nn.gelu
    gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        current = self.input_dim
        for i in range(self.num_layers):
            x = Conv1x1(current, self.hidden_dim, use_bias=True, gain=2.0, name=f"fwd_{i}")(x)
            x = self.act_layer(x)
            current = self.hidden_dim
        x = Conv1x1(current, self.output_dim, use_bias=False, gain=self.gain, name="out")(x)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + einsum (MXU-friendly;
    ref: makani/models/common/layers.py:65-83 uses a strided conv)."""

    img_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    in_chans: int = 3
    embed_dim: int = 768
    flatten: bool = True

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        ph, pw = self.patch_size
        assert H == self.img_size[0] and W == self.img_size[1], (
            f"Input image size ({H}*{W}) doesn't match model ({self.img_size[0]}*{self.img_size[1]})."
        )
        gh, gw = H // ph, W // pw
        fan_in = C * ph * pw
        std = (1.0 / fan_in) ** 0.5
        w = self.param("weight", normal_init(std), (self.embed_dim, C, ph, pw))
        b = self.param("bias", nn.initializers.zeros, (self.embed_dim,))
        # extract patches by reshape, then contract (c, ph, pw) on the MXU
        xp = x.reshape(B, C, gh, ph, gw, pw)
        y = jnp.einsum("bchpwq,ecpq->behw", xp, w.astype(x.dtype))
        y = y + b.astype(x.dtype)[None, :, None, None]
        if self.flatten:
            y = y.reshape(B, self.embed_dim, gh * gw)
        return y


# norm statistics compute mode: "f32" materializes an f32 copy of the
# activation for a two-pass mean/var (exact, the default and reference
# behavior); "bf16" keeps the elementwise pipeline in the input dtype with
# f32 ACCUMULATION only (one-pass E[x^2]-E[x]^2) — a traffic lever for the
# bf16-AMP flagship (round-4 trace: f32 norm intermediates are part of the
# 2.9x actual-vs-minimum HBM gap). Convergence impact must be A/B'd on chip
# before shipping as a default (BENCH_NORM=bf16).
_NORM_STATS = "f32"


def set_norm_stats_mode(mode):
    global _NORM_STATS
    assert mode in ("f32", "bf16"), mode
    _NORM_STATS = mode


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over (H, W), optional affine.
    No running stats (matches torch InstanceNorm2d with track_running_stats=False,
    used at ref: makani/models/networks/sfnonet.py:379)."""

    num_features: int
    eps: float = 1e-6
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        xdtype = x.dtype
        if _NORM_STATS == "bf16" and xdtype != jnp.float32:
            # one-pass stats, f32 accumulation over native-dtype elements;
            # elementwise normalize stays in the input dtype (fuses into
            # neighbors as a pure bf16 pipeline, no f32 copy materialized)
            mean = jnp.mean(x, axis=(-2, -1), keepdims=True, dtype=jnp.float32)
            sq = jnp.mean(x * x, axis=(-2, -1), keepdims=True, dtype=jnp.float32)
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            scale = jax.lax.rsqrt(var + self.eps)
            y = (x - mean.astype(xdtype)) * scale.astype(xdtype)
            if self.affine:
                w = self.param("weight", nn.initializers.ones, (self.num_features,))
                b = self.param("bias", nn.initializers.zeros, (self.num_features,))
                y = y * w.astype(xdtype)[None, :, None, None] \
                    + b.astype(xdtype)[None, :, None, None]
            return y
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(-2, -1), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            y = y * w[None, :, None, None] + b[None, :, None, None]
        return y.astype(xdtype)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm on NCHW tensors
    (ref: makani/mpu/layer_norm.py:117-155 transposes NCHW->NHWC->LN->back;
    here it's a direct reduction over the channel axis)."""

    num_features: int
    eps: float = 1e-6
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        xdtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            y = y * w[None, :, None, None] + b[None, :, None, None]
        return y.astype(xdtype)
