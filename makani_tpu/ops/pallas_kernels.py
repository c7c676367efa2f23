"""Pallas TPU kernels for the spectral hot path.

The dhconv contraction out[b,o,l,m] = sum_i w[i,o,l] * x[b,i,l,m] (complex;
ref contraction: makani/models/common/contractions.py:131-136) is the SFNO's
per-layer spectral mixing. As XLA ops this is 4 real batched matmuls (complex
= real pairs) each re-reading its inputs from HBM; the Pallas kernel performs
one VMEM pass per (batch, l-tile): both real/imag inputs are loaded once and
both outputs accumulate in f32 on the MXU.

Layout: activations as real pairs (2, B, L, C, M) [l-major so the per-l weight
slice is contiguous], weights (2, L, C, O). m is the lane dimension (pad M to
128), channels the sublane dimension.

Exposed as contract_dhconv_pallas(x, w) on the same (B, C, L, M) complex /
(C, O, L) complex logical shapes as the jnp path, with a custom VJP whose
backward passes reuse the same kernel (dx: contract with w^H over o;
dw: contract x with g over b,m).
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _dhconv_kernel(xr_ref, xi_ref, wr_ref, wi_ref, o_ref, *, precision):
    """One (b, l, m-tile) step: complex per-l channel mixing.

    xr/xi: (1, 1, C, TM)    block of x at mode l
    wr/wi: (1, C, O)        weight slice at mode l
    o:     (2, 1, 1, O, TM) stacked (real, imag) output block
    """
    xr = xr_ref[0, 0]  # (C, TM)
    xi = xi_ref[0, 0]
    wr = wr_ref[0]     # (C, O)
    wi = wi_ref[0]

    # contract C: (C, O) x (C, TM) -> (O, TM), f32 accumulation on the MXU.
    # precision matters: Mosaic's plain f32 dot is a single bf16 pass (~2%
    # error) and it rejects Precision.HIGH, so the 3-pass bf16 decomposition
    # (= the jnp path's HIGH / the reference's TF32) is built by hand from
    # hi/lo bf16 splits: a*b ~= ah*bh + ah*bl + al*bh.
    dn = (((0,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    if precision in (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST):
        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot3(a, b):
            ah, al = split(a)
            bh, bl = split(b)
            return dot(ah, bh) + dot(ah, bl) + dot(al, bh)
    else:
        dot3 = dot

    # 3-mult complex product: re = rr - ii, im = (wr+wi)(xr+xi) - rr - ii
    rr = dot3(wr, xr)
    ii = dot3(wi, xi)
    cross = dot3(wr + wi, xr + xi)

    o_ref[0, 0, 0] = rr - ii
    o_ref[1, 0, 0] = cross - rr - ii


def _dhconv_pallas_raw(xr, xi, wr, wi, interpret=False):
    """xr/xi: (B, L, C, M); wr/wi: (L, C, O) -> (B, L, O, M) real pairs."""
    from makani_tpu.ops import complex_ops

    precision = complex_ops._PRECISION
    B, L, C, M = xr.shape
    O = wr.shape[-1]

    TM = 128
    Mp = _round_up(M, TM)
    if Mp != M:
        pad = [(0, 0), (0, 0), (0, 0), (0, Mp - M)]
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)

    grid = (B, L, Mp // TM)

    x_spec = pl.BlockSpec((1, 1, C, TM), lambda b, l, m: (b, l, 0, m))
    w_spec = pl.BlockSpec((1, C, O), lambda b, l, m: (l, 0, 0))
    # single stacked (re, im) output
    o_spec = pl.BlockSpec((2, 1, 1, O, TM), lambda b, l, m: (0, b, l, 0, m))

    out = pl.pallas_call(
        functools.partial(_dhconv_kernel, precision=precision),
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((2, B, L, O, Mp), jnp.float32),
        interpret=interpret,
    )(xr, xi, wr, wi)

    ore, oim = out[0], out[1]
    if Mp != M:
        ore = ore[..., :M]
        oim = oim[..., :M]
    return ore, oim


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def contract_dhconv_pallas(x, w, interpret=False):
    """Complex dhconv contraction via Pallas: einsum('bilm,iol->bolm').

    x: complex (B, C, L, M); w: complex (C, O, L). Returns complex (B, O, L, M).
    """
    out, _ = _dhconv_fwd(x, w, interpret)
    return out


def _dhconv_fwd(x, w, interpret):
    B, C, L, M = x.shape
    # l-major layouts
    xr = jnp.transpose(jnp.real(x), (0, 2, 1, 3))  # (B, L, C, M)
    xi = jnp.transpose(jnp.imag(x), (0, 2, 1, 3))
    wr = jnp.transpose(jnp.real(w), (2, 0, 1))  # (L, C, O)
    wi = jnp.transpose(jnp.imag(w), (2, 0, 1))
    ore, oim = _dhconv_pallas_raw(xr, xi, wr, wi, interpret=interpret)
    out = jax.lax.complex(jnp.transpose(ore, (0, 2, 1, 3)), jnp.transpose(oim, (0, 2, 1, 3)))
    return out, (x, w)


def _dhconv_bwd(interpret, res, g):
    """JAX transposes complex einsums bilinearly (no conjugation): the
    cotangents are plain-transposed contractions, reusing the same kernel."""
    x, w = res
    # dx[b,i,l,m] = sum_o w[i,o,l] g[b,o,l,m]
    dx = contract_dhconv_pallas(g, jnp.transpose(w, (1, 0, 2)), interpret)
    # dw[i,o,l] = sum_{b,m} x[b,i,l,m] g[b,o,l,m]
    dw = jnp.einsum("bilm,bolm->iol", x, g)
    return dx, dw


contract_dhconv_pallas.defvjp(_dhconv_fwd, _dhconv_bwd)
