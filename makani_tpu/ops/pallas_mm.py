"""Multi-pass bf16 Pallas matmul kernels for the spectral coefficient stage.

The SFNO hot path is three batched-matmul families (ref call stack:
makani/models/common/spectral_convolution.py:124-141):

  - grid dots       : longitude DFT/iDFT, one big (R,K)@(K,N) matmul
  - Legendre dots   : per-m batched (C,K)@(K,L) latitude contraction
  - dhconv          : per-l batched complex (C->O) channel mixing
                      (ref contraction: makani/models/common/contractions.py:131-136)

The reference runs these as fp32 matmuls executed as TF32 under autocast
(~10 mantissa bits per operand). The TPU equivalent is the multi-pass bf16
decomposition: a*b ~= ah*bh + ah*bl + al*bh ("HIGH", ~16 bits/operand).
XLA's HIGH kernel on f32 operands runs at less than half the chip's bf16
dot rate, and expressing the passes as separate jnp einsums materializes
every pass to HBM (measured slower end-to-end, see BENCH_NOTES.md). These
kernels perform the operand hi/lo splits *in VMEM* and accumulate all
passes on the MXU before a single f32 output write — full-HIGH accuracy at
(near) single-pass cost, because all three families are HBM-bound once the
passes stop spilling.

`passes` selects the accuracy/throughput point:
  1 = both operands bf16 (XLA DEFAULT equivalent)
  2 = activation bf16, table/weight hi/lo split (exact w, 7-bit act)
  3 = both operands hi/lo split, ah*bh + ah*bl + al*bh (XLA HIGH equivalent)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _mp_dot(a, b, dn, passes):
    """Multi-pass bf16 dot with f32 VMEM accumulation (see module docstring)."""

    def dot(u, v):
        return jax.lax.dot_general(u, v, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    ah = a.astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    if passes == 1:
        return dot(ah, bh)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    if passes == 2:
        return dot(ah, bh) + dot(ah, bl)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


# --------------------------------------------------------------------------
# grid dot: (R, K) @ (K, N) -> (R, N)
# --------------------------------------------------------------------------

def _gridmm_kernel(x_ref, t_ref, o_ref, *, passes):
    o_ref[...] = _mp_dot(
        x_ref[...], t_ref[...], (((1,), (0,)), ((), ())), passes
    ).astype(o_ref.dtype)


def gridmm(x, t, passes=3, out_dtype=jnp.float32, tr=512, interpret=False):
    """(R, K) @ (K, N) with multi-pass bf16 accumulation; table resident."""
    R, K = x.shape
    N = t.shape[1]
    Rp = _round_up(R, tr)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))

    xbytes = 2 if x.dtype == jnp.bfloat16 else 4
    cost = pl.CostEstimate(
        flops=2 * Rp * K * N * passes,
        bytes_accessed=Rp * K * xbytes + K * N * 4 + Rp * N * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_gridmm_kernel, passes=passes),
        grid=(Rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, K), lambda r: (r, 0)),
            pl.BlockSpec((K, N), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, N), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )(x, t)
    return out[:R] if Rp != R else out


# --------------------------------------------------------------------------
# Legendre dot: per-mode batched (C, K) @ (K, L); table indexed m % mmax so
# a (2*mmax, C, K) re/im-stacked activation shares one (mmax, L, K) table
# --------------------------------------------------------------------------

def _legmm_kernel(z_ref, p_ref, o_ref, *, passes, contract):
    z = z_ref[0]  # (C, K)
    p = p_ref[0]  # (L, K) table, K-minor both directions
    # analysis contracts z's K with table's K ((C,K)x(L,K) -> (C,L));
    # synthesis contracts z's L with table's L ((C,L)x(L,K) -> (C,K))
    dn = (((1,), (1,)), ((), ())) if contract == "k" else (((1,), (0,)), ((), ()))
    o_ref[0] = _mp_dot(z, p, dn, passes)


def legmm(z, p, passes=3, contract="k", interpret=False):
    """z (M2, C, K) batched against p (mmax, L, K); M2 = 2*mmax (re/im rows).

    contract="k": analysis  (M2, C, K) x (mmax, L, K) -> (M2, C, L)
    contract="l": synthesis (M2, C, L) x (mmax, L, K) -> (M2, C, K)
    """
    M2, C, K = z.shape
    mmax, L, Kp = p.shape
    out_n = L if contract == "k" else Kp
    if contract == "l":
        assert K == L, (z.shape, p.shape)

    cost = pl.CostEstimate(
        flops=2 * M2 * C * L * Kp * passes,
        bytes_accessed=(z.size + p.size + M2 * C * out_n) * 4,
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_legmm_kernel, passes=passes, contract=contract),
        grid=(M2,),
        in_specs=[
            pl.BlockSpec((1, C, K), lambda m: (m, 0, 0)),
            pl.BlockSpec((1, L, Kp), lambda m: (m % mmax, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, out_n), lambda m: (m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M2, C, out_n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )(z, p)


# --------------------------------------------------------------------------
# dhconv: per-l batched complex channel mixing
#   out[b,o,l,m] = sum_i w[i,o,l] * x[b,i,l,m]
# on stacked-real layouts x (2, B, L, C, M), w (2, L, C, O) -> (2, B, L, O, M)
# --------------------------------------------------------------------------

def _dhconv_mm_kernel(x_ref, w_ref, o_ref, *, passes, m3, wdim, conj_w):
    xr = x_ref[0, 0, 0]  # (C|O, Mp)
    xi = x_ref[1, 0, 0]
    wr = w_ref[0, 0]     # (C, O)
    wi = w_ref[1, 0]
    if conj_w:
        wi = -wi
    # fwd contracts w's C (dim 0): (C,O)x(C,Mp) -> (O,Mp)
    # dx  contracts w's O (dim 1): (C,O)x(O,Mp) -> (C,Mp)
    dn = (((wdim,), (0,)), ((), ()))

    rr = _mp_dot(wr, xr, dn, passes)
    ii = _mp_dot(wi, xi, dn, passes)
    if m3:
        cross = _mp_dot(wr + wi, xr + xi, dn, passes)
        o_ref[0, 0, 0] = rr - ii
        o_ref[1, 0, 0] = cross - rr - ii
    else:
        ri = _mp_dot(wr, xi, dn, passes)
        ir = _mp_dot(wi, xr, dn, passes)
        o_ref[0, 0, 0] = rr - ii
        o_ref[1, 0, 0] = ri + ir


def dhconv_mm(x, w, passes=3, m3=True, wdim=0, conj_w=False, interpret=False):
    """x (2, B, L, Cin, M) [stacked re/im], w (2, L, C, O) -> (2, B, L, Cout, M).

    wdim=0 contracts w's C dim (forward: Cin=C, Cout=O);
    wdim=1 contracts w's O dim (backward dx: Cin=O, Cout=C).
    conj_w negates w's imaginary plane in-kernel (cotangent rules).
    """
    _, B, L, Ci, M = x.shape
    Co = w.shape[3 - wdim]
    Mp = _round_up(M, 128)
    if Mp != M:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Mp - M)))

    groups = 3 if m3 else 4
    cost = pl.CostEstimate(
        flops=2 * B * L * Ci * Co * Mp * passes * groups,
        bytes_accessed=(x.size + w.size + 2 * B * L * Co * Mp) * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_dhconv_mm_kernel, passes=passes, m3=m3,
                          wdim=wdim, conj_w=conj_w),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((2, 1, 1, Ci, Mp), lambda b, l: (0, b, l, 0, 0)),
            pl.BlockSpec((2, 1, w.shape[2], w.shape[3]), lambda b, l: (0, l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, 1, 1, Co, Mp), lambda b, l: (0, b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, B, L, Co, Mp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w)
    return out[..., :M] if Mp != M else out


# --------------------------------------------------------------------------
# differentiable wrappers (custom VJPs over the raw kernels)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def legdot(z, p, contract="k", passes=3, interpret=False):
    """Differentiable per-m Legendre contraction (see legmm).

    The table `p` is a precomputed constant of the transform (hoisted step
    argument, never optimized) so its cotangent is returned as zeros — XLA
    dead-code-eliminates the buffer when, as always, nothing consumes it.
    """
    return legmm(z, p, passes=passes, contract=contract, interpret=interpret)


def _legdot_fwd(z, p, contract, passes, interpret):
    return legmm(z, p, passes=passes, contract=contract, interpret=interpret), p


def _legdot_bwd(contract, passes, interpret, p, g):
    # the contraction is linear in z; its transpose is the opposite-direction
    # contraction against the same (symmetric-use, ortho-normalized) table
    other = "l" if contract == "k" else "k"
    dz = legmm(g, p, passes=passes, contract=other, interpret=interpret)
    return dz, jnp.zeros_like(p)


legdot.defvjp(_legdot_fwd, _legdot_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dhconv(x, w, passes=3, interpret=False):
    """Differentiable complex dhconv on stacked-real layouts (see dhconv_mm).

    x (2, B, L, C, M), w (2, L, C, O) -> (2, B, L, O, M). Cotangent rules are
    the complex-linear ones: dx = g . conj(w) (contract O), dw = conj(x) . g
    (contract B, M) — matching what jax.grad derives for the XLA einsum form
    (ref contraction: makani/models/common/contractions.py:131-136).
    """
    return dhconv_mm(x, w, passes=passes, interpret=interpret)


def _dhconv_fwd(x, w, passes, interpret):
    return dhconv_mm(x, w, passes=passes, interpret=interpret), (x, w)


def _dhconv_bwd(passes, interpret, res, g):
    x, w = res
    dx = dhconv_mm(g, w, passes=passes, wdim=1, conj_w=True, interpret=interpret)
    dw = dhconv_dw(x, g, passes=passes, interpret=interpret)
    return dx, dw


dhconv.defvjp(_dhconv_fwd, _dhconv_bwd)


def _dhconv_dw_kernel(x_ref, g_ref, o_ref, *, passes, m3):
    """dw[l] = conj(x[l]) @ g[l]^T over m (and the resident-b sweep)."""
    xr = x_ref[0, 0, 0]  # (C, Mp)
    xi = x_ref[1, 0, 0]
    gr = g_ref[0, 0, 0]  # (O, Mp)
    gi = g_ref[1, 0, 0]
    dn = (((1,), (1,)), ((), ()))  # contract M: (C,Mp)x(O,Mp) -> (C,O)

    # dw = conj(x) . g : re = xr.gr + xi.gi ; im = xr.gi - xi.gr
    rr = _mp_dot(xr, gr, dn, passes)
    ii = _mp_dot(xi, gi, dn, passes)
    if m3:
        # (xr - xi).(gr + gi) = xr.gr + xr.gi - xi.gr - xi.gi
        cross = _mp_dot(xr - xi, gr + gi, dn, passes)
        re = rr + ii
        im = cross - rr + ii
    else:
        ri = _mp_dot(xr, gi, dn, passes)
        ir = _mp_dot(xi, gr, dn, passes)
        re = rr + ii
        im = ri - ir

    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        o_ref[0, 0] = re
        o_ref[1, 0] = im

    @pl.when(b > 0)
    def _():
        o_ref[0, 0] += re
        o_ref[1, 0] += im


def dhconv_dw(x, g, passes=3, m3=True, interpret=False):
    """x (2, B, L, C, M), g (2, B, L, O, M) -> dw (2, L, C, O), summed over b, m."""
    _, B, L, C, M = x.shape
    O = g.shape[3]
    Mp = _round_up(M, 128)
    if Mp != M:
        # zero padding keeps the m-contraction exact
        pad = ((0, 0), (0, 0), (0, 0), (0, 0), (0, Mp - M))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)

    groups = 3 if m3 else 4
    cost = pl.CostEstimate(
        flops=2 * B * L * C * O * Mp * passes * groups,
        bytes_accessed=(x.size + g.size + 2 * L * C * O) * 4,
        transcendentals=0,
    )
    # b innermost so the out block stays resident across the b-sweep
    return pl.pallas_call(
        functools.partial(_dhconv_dw_kernel, passes=passes, m3=m3),
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((2, 1, 1, C, Mp), lambda l, b: (0, b, l, 0, 0)),
            pl.BlockSpec((2, 1, 1, O, Mp), lambda l, b: (0, b, l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, 1, C, O), lambda l, b: (0, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, L, C, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(x, g)
