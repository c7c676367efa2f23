"""Spectral convolution and spectral attention layers (flax.linen).

The core SFNO ops (ref: makani/models/common/spectral_convolution.py:43-405):
forward spectral transform (SHT or FFT, always f32) -> complex weight
contraction -> inverse transform. Complex weights are stored as real (..., 2)
pairs so optimizers/checkpointing stay real-valued and Pallas kernels can
consume them directly.
"""

import math
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from makani_tpu.ops.complex_ops import view_as_complex, get_contract_fun
from makani_tpu.models.common.activations import ComplexReLU


def _spectral_weight_init(scale_per_l, shape, l_axis):
    """Complex weight init: N(0,1) * scale(l), with the l=0 row scaled by
    sqrt(2) (the m=0/l=0 coefficient is effectively real; ref:
    spectral_convolution.py:98-101). Returns real pairs (..., 2)."""

    def init(key, *, dtype=jnp.float32):
        w = jax.random.normal(key, tuple(shape) + (2,), dtype)
        bshape = [1] * (len(shape) + 1)
        bshape[l_axis] = shape[l_axis]
        return w * scale_per_l.reshape(bshape)

    return init


class SpectralConv(nn.Module):
    """Linear spectral convolution on the sphere (or torus via FFT).

    forward_transform / inverse_transform are RealSHT/InverseRealSHT (or
    RealFFT2/InverseRealFFT2) instances; their (nlat, nlon, grid) determine
    whether a resolution-changing residual must be computed
    (ref: spectral_convolution.py:62-64).
    """

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    operator_type: str = "diagonal"
    separable: bool = False
    bias: Union[bool, str] = False
    gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        fwd_t, inv_t = self.forward_transform, self.inverse_transform
        modes_lat, modes_lon = inv_t.lmax, inv_t.mmax

        scale_residual = (fwd_t.nlat != inv_t.nlat) or (fwd_t.nlon != inv_t.nlon)
        if hasattr(fwd_t, "grid"):
            scale_residual = scale_residual or (fwd_t.grid != getattr(inv_t, "grid", None))

        # weight shape
        weight_shape = [self.in_channels]
        if not self.separable:
            weight_shape += [self.out_channels]
        if self.operator_type == "diagonal":
            weight_shape += [modes_lat, modes_lon]
            l_axis = len(weight_shape) - 2
        elif self.operator_type == "dhconv":
            weight_shape += [modes_lat]
            l_axis = len(weight_shape) - 1
        else:
            raise ValueError(f"Unsupported operator type {self.operator_type}")

        scale = math.sqrt(self.gain / self.in_channels) * jnp.ones((modes_lat,), jnp.float32)
        scale = scale.at[0].mul(math.sqrt(2.0))
        weight = self.param("weight", _spectral_weight_init(scale, weight_shape, l_axis))

        contract = get_contract_fun(self.operator_type, self.separable)

        dtype = x.dtype
        residual = x

        # transforms accumulate in f32 (ref: spectral_convolution.py:130-141);
        # bf16 AMP inputs are consumed directly by the transform's DFT matmul
        # (bit-identical to an f32 upcast under HIGH precision — ops/sht.py)
        if x.dtype not in (jnp.bfloat16, jnp.float32):
            x = x.astype(jnp.float32)

        # Stacked-real coefficient pipeline (serial fast path): keeps the
        # whole transform -> dhconv -> inverse chain in real planes and in
        # the layouts the multi-pass Pallas kernels want (m-leading for the
        # Legendre dots, l-major for the per-l channel mixing) — complex64
        # never materializes and XLA inserts no relayout copies between the
        # coefficient stages. Same numerics as the complex path at the
        # active transform precision.
        from makani_tpu.ops import sht as _sht
        if (self.operator_type == "dhconv" and not self.separable
                and _sht._stacked_engine_active()
                and hasattr(fwd_t, "analysis_stacked")
                and hasattr(inv_t, "synthesis_stacked")
                and x.ndim == 4):
            from makani_tpu.ops.complex_ops import contract_dhconv_stacked

            z = fwd_t.analysis_stacked(x)            # (2*mmax, B, C, L)
            if scale_residual:
                residual = inv_t.synthesis_stacked(z).astype(dtype)
            mmax = z.shape[0] // 2
            B = z.shape[1]
            zs = z.reshape(2, mmax, B, self.in_channels, modes_lat)
            zs = jnp.transpose(zs, (0, 2, 4, 3, 1))   # (2, B, L, C, mmax)
            ws = jnp.transpose(weight, (3, 2, 0, 1))  # (2, L, C, O)
            o = contract_dhconv_stacked(zs, ws)       # (2, B, L, O, mmax)
            o = jnp.transpose(o, (0, 4, 1, 3, 2))     # (2, mmax, B, O, L)
            o = o.reshape(2 * mmax, B, self.out_channels, modes_lat)
            x = inv_t.synthesis_stacked(o)

            if self.bias == "constant":
                b = self.param("bias_const", nn.initializers.zeros,
                               (1, self.out_channels, 1, 1))
                x = x + b
            elif self.bias == "position":
                b = self.param("bias_pos", nn.initializers.zeros,
                               (1, self.out_channels, inv_t.nlat, inv_t.nlon))
                x = x + b
            return x.astype(dtype), residual
        x = fwd_t(x)
        from makani_tpu.parallel import spmd as _spmd
        if _spmd.model_distributed():
            # anchor the coefficients to the canonical layout WITH fin kept
            # sharded on channels before fan-out to the contraction and
            # scale_residual branches. The inverse transforms pin their input
            # cotangents to channels-over-(fin,h); summing those under a
            # fin-REPLICATED target would need allgather(fin)+reshard, which
            # the SPMD partitioner only does as replicate-then-slice
            # (involuntary full remat). With fin kept sharded the branch-
            # cotangent add resolves to a pure (c<->l) all-to-all.
            x = _spmd.constrain(x, "data", "fin", "h", "w")
        if scale_residual:
            residual = inv_t(x).astype(dtype)

        w = view_as_complex(weight)
        # Pin the complex-viewed weight to the stored layout (i/fin, l/h
        # [, m/w] — parallel/partitioning.py filter rule). The backward of
        # this constraint reshards the weight cotangent as a plain all-to-all
        # BEFORE the real-pair slice's pad/reshape transpose, which the
        # partitioner cannot reshard across (involuntary full remat otherwise).
        from makani_tpu.parallel import spmd
        if spmd.model_distributed():
            if self.operator_type == "diagonal":
                spec = ("fin", None, "h", "w") if not self.separable else ("fin", "h", "w")
            else:
                spec = ("fin", None, "h") if not self.separable else ("fin", "h")
            w = spmd.constrain(w, *spec)
        x = contract(x, w)
        if spmd.model_distributed():
            # pin the contraction output to (b/data, o, l/h, m/w): the
            # backward then sees dy in exactly the layout both transpose dots
            # want (dx: contract o, batch l/h; dw: contract b,m -> psum over
            # data,w; batch l/h), so no involuntary weight/activation remats
            x = spmd.constrain(x, "data", None, "h", "w")

        x = inv_t(x)

        if self.bias == "constant":
            b = self.param("bias_const", nn.initializers.zeros, (1, self.out_channels, 1, 1))
            x = x + b
        elif self.bias == "position":
            b = self.param("bias_pos", nn.initializers.zeros, (1, self.out_channels, inv_t.nlat, inv_t.nlon))
            x = x + b

        return x.astype(dtype), residual


class SpectralAttention(nn.Module):
    """Non-linear spectral MLP in coefficient space
    (ref: spectral_convolution.py:268-405)."""

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    operator_type: str = "diagonal"
    hidden_size_factor: int = 2
    complex_activation: str = "real"
    bias: bool = False
    spectral_layers: int = 1
    drop_rate: float = 0.0
    gain: float = 1.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fwd_t, inv_t = self.forward_transform, self.inverse_transform
        modes_lat = fwd_t.lmax

        scale_residual = (
            (fwd_t.nlat != inv_t.nlat)
            or (fwd_t.nlon != inv_t.nlon)
            or (getattr(fwd_t, "grid", None) != getattr(inv_t, "grid", None))
        )

        hidden_size = int(self.hidden_size_factor * self.in_channels)

        def cplx_param(name, shape, std):
            init = lambda key: std * jax.random.normal(key, tuple(shape) + (2,), jnp.float32)
            return view_as_complex(self.param(name, lambda key: init(key)))

        dtype = x.dtype
        residual = x
        x = x.astype(jnp.float32)

        x = fwd_t(x)
        if scale_residual:
            residual = inv_t(x).astype(dtype)

        # spectral MLP
        scale_out = math.sqrt(self.gain / self.in_channels)
        for l in range(self.spectral_layers):
            in_dim = self.in_channels if l == 0 else hidden_size
            std = math.sqrt(2.0 / float(in_dim))
            if self.operator_type == "diagonal":
                w = cplx_param(f"w_{l}", (in_dim, hidden_size), std)
                x = jnp.einsum("bixy,io->boxy", x, w)
            elif self.operator_type == "l-dependant":
                w = cplx_param(f"w_{l}", (modes_lat, in_dim, hidden_size), std)
                x = jnp.einsum("bixy,xio->boxy", x, w)
            else:
                raise ValueError("Unknown operator type")
            if self.bias:
                b = cplx_param(f"b_{l}", (hidden_size, 1, 1), scale_out)
                x = x + b
            x = ComplexReLU(mode=self.complex_activation, bias_shape=(hidden_size, 1, 1),
                            scale=scale_out, name=f"act_{l}")(x)
            if self.drop_rate > 0.0:
                x = nn.Dropout(rate=self.drop_rate)(x, deterministic=deterministic)

        if self.operator_type == "diagonal":
            wout = cplx_param("wout", (hidden_size, self.out_channels), scale_out)
            x = jnp.einsum("bixy,io->boxy", x, wout)
        else:
            wout = cplx_param("wout", (modes_lat, hidden_size, self.out_channels), scale_out)
            x = jnp.einsum("bixy,xio->boxy", x, wout)

        x = inv_t(x)

        return x.astype(dtype), residual
