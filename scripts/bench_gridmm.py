"""Microbench: grid-side DFT matmul variants at flagship shapes.

The longitude DFT/iDFT are plain matmuls (rows = batch*chan*lat). Under AMP
the analysis input is bf16, so HIGH's 3-pass bf16 decomposition wastes a pass
(activation lo-split == 0). XLA can't express "2-pass with in-VMEM
accumulation" (two einsums + add materializes each pass — measured 4% SLOWER
end-to-end), so the candidate fix is a Pallas kernel that accumulates the
hi/lo table passes in VMEM and writes one output.

Variants:
  a) xla_2dot   : out_re = x@C, out_im = x@S as today (HIGH, f32 upcast)
  b) xla_stacked: single x @ [C|S] HIGH dot
  c) pallas_2p  : bf16 x, table hi/lo split, 2 MXU passes, VMEM accumulate
  d) pallas_3p  : f32 x (hi/lo split in kernel), 3 passes (synthesis case)

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_gridmm.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _grid_dot_kernel(x_ref, th_ref, tl_ref, o_ref, *, x_f32):
    x = x_ref[...]
    th = th_ref[...]
    tl = tl_ref[...]
    dn = (((1,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    if x_f32:
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = dot(xh, th) + dot(xh, tl) + dot(xl, th)
    else:
        acc = dot(x, th) + dot(x, tl)
    o_ref[...] = acc.astype(o_ref.dtype)


def grid_dot_pallas(x, t, out_dtype=jnp.float32, tr=512):
    """x [R, K] bf16|f32, t [K, N] f32 -> [R, N] out_dtype, HIGH-equivalent."""
    R, K = x.shape
    N = t.shape[1]
    Rp = _round_up(R, tr)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))
    th = t.astype(jnp.bfloat16)
    tl = (t - th.astype(jnp.float32)).astype(jnp.bfloat16)
    x_f32 = x.dtype != jnp.bfloat16

    out = pl.pallas_call(
        functools.partial(_grid_dot_kernel, x_f32=x_f32),
        grid=(Rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, K), lambda r: (r, 0)),
            pl.BlockSpec((K, N), lambda r: (0, 0)),
            pl.BlockSpec((K, N), lambda r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, N), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, N), out_dtype),
    )(x, th, tl)
    return out[:R]


def timeit(name, fn, x, *args, iters=30):
    # loop-carried dependency through x so XLA cannot hoist the matmul out
    # of the loop (a pure `s + sum(fn(x))` body is loop-invariant and gets
    # CSE'd to a single execution)
    def body(i, carry):
        s, xc = carry
        o = fn(xc, *args)
        probe = o.reshape(-1)[0].astype(jnp.float32)
        corner = tuple(slice(0, 1) for _ in xc.shape)
        xc = jax.lax.dynamic_update_slice(
            xc, xc[corner] + probe.astype(xc.dtype) * 1e-30,
            (0,) * xc.ndim)
        return s + probe, xc

    f = jax.jit(lambda xx: jax.lax.fori_loop(0, iters, body, (0.0, xx))[0])
    float(f(x))  # compile+warm
    t0 = time.perf_counter()
    float(f(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    R, K, N = 320 * 721, 1440, 482
    xb = jnp.asarray(rng.randn(R, K).astype(np.float32)).astype(jnp.bfloat16)
    C = jnp.asarray(rng.randn(K, N // 2).astype(np.float32))
    S = jnp.asarray(rng.randn(K, N // 2).astype(np.float32))
    T = jnp.concatenate([C, S], axis=1)
    H = jax.lax.Precision.HIGH

    print(f"== analysis {R}x{K} @ {K}x{N} (bf16 activation)")
    timeit("xla_2dot HIGH", lambda x: jnp.einsum("rk,kn->rn", x.astype(jnp.float32), C, precision=H)
           + jnp.einsum("rk,kn->rn", x.astype(jnp.float32), S, precision=H), xb)
    timeit("xla_stacked HIGH", lambda x: jnp.einsum("rk,kn->rn", x.astype(jnp.float32), T, precision=H), xb)
    timeit("pallas_2pass", lambda x: grid_dot_pallas(x, T), xb)

    # accuracy vs float64 host
    xs = np.asarray(xb[:2048].astype(jnp.float32), dtype=np.float64)
    ref = xs @ np.asarray(T, dtype=np.float64)
    got_xla = np.asarray(jnp.einsum("rk,kn->rn", xb[:2048].astype(jnp.float32), T, precision=H))
    got_pal = np.asarray(grid_dot_pallas(xb[:2048], T))
    scale = np.abs(ref).max()
    print(f"maxrel xla HIGH  : {np.abs(got_xla-ref).max()/scale:.3e}")
    print(f"maxrel pallas 2p : {np.abs(got_pal-ref).max()/scale:.3e}")

    print(f"== synthesis {R}x{N} @ {N}x{K} (f32 activation, bf16 out)")
    zf = jnp.asarray(rng.randn(R, N).astype(np.float32))
    Ts = jnp.asarray(rng.randn(N, K).astype(np.float32))
    timeit("xla_2dot HIGH f32out", lambda z: jnp.einsum("rm,mj->rj", z[:, :241], Ts[:241], precision=H)
           - jnp.einsum("rm,mj->rj", z[:, 241:], Ts[241:], precision=H), zf)
    timeit("xla_stacked HIGH bf16out", lambda z: jnp.einsum(
        "rm,mj->rj", z, Ts, precision=H).astype(jnp.bfloat16), zf)
    timeit("pallas_3pass bf16out", lambda z: grid_dot_pallas(z, Ts, out_dtype=jnp.bfloat16), zf)

    ref2 = np.asarray(zf[:2048], dtype=np.float64) @ np.asarray(Ts, dtype=np.float64)
    got2 = np.asarray(grid_dot_pallas(zf[:2048], Ts, out_dtype=jnp.float32))
    scale2 = np.abs(ref2).max()
    print(f"maxrel pallas 3p : {np.abs(got2-ref2).max()/scale2:.3e}")

    # hypothesis probes: what exactly makes the f32-operand dot slow?
    timeit("xla_stacked HIGHEST f32", lambda z: jnp.einsum(
        "rm,mj->rj", z, Ts, precision=jax.lax.Precision.HIGHEST).astype(jnp.bfloat16), zf)
    timeit("xla_stacked DEFAULT f32", lambda z: jnp.einsum(
        "rm,mj->rj", z, Ts).astype(jnp.bfloat16), zf)
    timeit("xla z->bf16 stacked HIGH", lambda z: jnp.einsum(
        "rm,mj->rj", z.astype(jnp.bfloat16).astype(jnp.float32), Ts,
        precision=H).astype(jnp.bfloat16), zf)
    # explicit split2: bf16 activation x hi/lo table, two dots
    Th = Ts.astype(jnp.bfloat16)
    Tl = (Ts - Th.astype(jnp.float32)).astype(jnp.bfloat16)
    timeit("xla z->bf16 hi/lo 2dot", lambda z: (
        jnp.einsum("rm,mj->rj", z.astype(jnp.bfloat16), Th, preferred_element_type=jnp.float32)
        + jnp.einsum("rm,mj->rj", z.astype(jnp.bfloat16), Tl, preferred_element_type=jnp.float32)
    ).astype(jnp.bfloat16), zf)

    # does a MATERIALIZED bf16 buffer (concat output) re-engage the fast
    # kernel, unlike the fused f32->bf16->f32 round-trip above?
    timeit("xla concat-bf16 stacked HIGH", lambda z: jnp.einsum(
        "rm,mj->rj",
        jnp.concatenate([z[:, :241].astype(jnp.bfloat16),
                         z[:, 241:].astype(jnp.bfloat16)], axis=1).astype(jnp.float32),
        Ts, precision=H).astype(jnp.bfloat16), zf)
    got3 = np.asarray(jax.jit(lambda z: jnp.einsum(
        "rm,mj->rj", z.astype(jnp.bfloat16).astype(jnp.float32), Ts,
        precision=H))(zf[:2048]))
    print(f"maxrel bf16-rounded act HIGH: {np.abs(got3-ref2).max()/scale2:.3e}")

    # HIGH-via-bf16-buffers: split the f32 activation into hi/lo bf16
    # BUFFERS (optimization_barrier forces materialization) and give each
    # its own single-consumer dot — if both dots hit the fast bf16-operand
    # kernel this is full-HIGH accuracy at ~2 bf16-dot cost
    def xsplit_barrier(z):
        zh = z.astype(jnp.bfloat16)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        zh, zl = jax.lax.optimization_barrier((zh, zl))
        return (jnp.einsum("rm,mj->rj", zh.astype(jnp.float32), Ts, precision=H)
                + jnp.einsum("rm,mj->rj", zl.astype(jnp.float32), Ts, precision=H)
                ).astype(jnp.bfloat16)

    def xsplit_plain(z):
        zh = z.astype(jnp.bfloat16)
        zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.einsum("rm,mj->rj", zh.astype(jnp.float32), Ts, precision=H)
                + jnp.einsum("rm,mj->rj", zl.astype(jnp.float32), Ts, precision=H)
                ).astype(jnp.bfloat16)

    timeit("xla xsplit barrier HIGH", xsplit_barrier, zf)
    timeit("xla xsplit plain HIGH", xsplit_plain, zf)
    got4 = np.asarray(jax.jit(xsplit_barrier)(zf[:2048]).astype(jnp.float32))
    print(f"maxrel xsplit (thru bf16 out): {np.abs(got4-ref2).max()/scale2:.3e}")

    print("== Legendre shape (m-batched) [241m] x [320c,240k] @ [240k,240l]")
    xc = jnp.asarray(rng.randn(320, 240, 241).astype(np.float32))  # [c,k,m]
    P = jnp.asarray(rng.randn(241, 240, 240).astype(np.float32))   # [m,l,k]
    timeit("legendre HIGH f32", lambda x: jnp.einsum("ckm,mlk->clm", x, P, precision=H), xc)
    timeit("legendre HIGH bf16act", lambda x: jnp.einsum(
        "ckm,mlk->clm", x.astype(jnp.bfloat16).astype(jnp.float32), P, precision=H), xc)
    timeit("legendre DEFAULT", lambda x: jnp.einsum("ckm,mlk->clm", x, P), xc)


if __name__ == "__main__":
    main()
