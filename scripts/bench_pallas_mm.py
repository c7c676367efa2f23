"""On-chip tuning bench for ops/pallas_mm.py (multi-pass Pallas kernels).

Times the three hot dot families at flagship inner-grid shapes against the
XLA einsum forms the model currently runs. Loop-carried operands (see
BENCH_NOTES.md round-2 methodology) and fresh jits per variant.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_pallas_mm.py [family]
  family in {dhconv, legendre, grid, all} (default all)
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops import pallas_mm

H = jax.lax.Precision.HIGH


def timeit(name, fn, x, *args, iters=20):
    def body(i, carry):
        s, xc = carry
        o = fn(xc, *args)
        probe = o.reshape(-1)[0].astype(jnp.float32)
        corner = tuple(slice(0, 1) for _ in xc.shape)
        xc = jax.lax.dynamic_update_slice(
            xc, xc[corner] + probe.astype(xc.dtype) * 1e-30, (0,) * xc.ndim)
        return s + probe, xc

    f = jax.jit(lambda xx: jax.lax.fori_loop(0, iters, body, (0.0, xx))[0])
    float(f(x))  # compile + warm
    t0 = time.perf_counter()
    float(f(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def bench_dhconv():
    rng = np.random.RandomState(0)
    B, L, C, O, M = 1, 240, 320, 320, 241
    xs = jnp.asarray(rng.randn(2, B, L, C, M).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(2, L, C, O).astype(np.float32) * 0.05)
    gs = jnp.asarray(rng.randn(2, B, L, O, M).astype(np.float32) * 0.1)

    print(f"== dhconv B{B} L{L} C{C} O{O} M{M} (stacked-real layout)", flush=True)

    # XLA reference on the same layout (complex inside jit)
    def xla_fwd(xs, prec):
        x = jax.lax.complex(xs[0], xs[1])
        w = jax.lax.complex(ws[0], ws[1])
        xr, xi = jnp.real(x), jnp.imag(x)
        wr, wi = jnp.real(w), jnp.imag(w)
        eq = "blcm,lco->blom"
        rr = jnp.einsum(eq, xr, wr, precision=prec)
        ii = jnp.einsum(eq, xi, wi, precision=prec)
        cross = jnp.einsum(eq, xr + xi, wr + wi, precision=prec)
        return jnp.stack([rr - ii, cross - rr - ii])

    timeit("xla HIGH 3M fwd", lambda v: xla_fwd(v, H), xs)
    timeit("xla DEFAULT 3M fwd", lambda v: xla_fwd(v, jax.lax.Precision.DEFAULT), xs)
    for p in (1, 3):
        timeit(f"pallas p{p} fwd", lambda v, p=p: pallas_mm.dhconv_mm(v, ws, passes=p), xs)
    timeit("pallas p3 dx", lambda v: pallas_mm.dhconv_mm(v, ws, passes=3, wdim=1, conj_w=True), gs)
    timeit("pallas p3 dw", lambda v: pallas_mm.dhconv_dw(xs, v, passes=3), gs)
    timeit("xla HIGH dw", lambda v: jnp.stack([
        jnp.einsum("blcm,blom->lco", xs[0], v[0], precision=H)
        + jnp.einsum("blcm,blom->lco", xs[1], v[1], precision=H),
        jnp.einsum("blcm,blom->lco", xs[0], v[1], precision=H)
        - jnp.einsum("blcm,blom->lco", xs[1], v[0], precision=H)]), gs)

    # accuracy
    xc = np.asarray(xs[0], np.float64) + 1j * np.asarray(xs[1], np.float64)
    wc = np.asarray(ws[0], np.float64) + 1j * np.asarray(ws[1], np.float64)
    ref = np.einsum("blcm,lco->blom", xc, wc)
    for p in (1, 3):
        got = np.asarray(jax.jit(functools.partial(pallas_mm.dhconv_mm, passes=p))(xs, ws))
        err = max(np.abs(got[0] - ref.real).max(), np.abs(got[1] - ref.imag).max()) / np.abs(ref).max()
        print(f"pallas p{p} fwd maxrel: {err:.3e}", flush=True)


def bench_legendre():
    rng = np.random.RandomState(0)
    # inner-grid analysis: z (2*mmax, C, nlat) @ pct (mmax, lmax, nlat)
    mmax, C, K, L = 241, 320, 240, 240
    z = jnp.asarray(rng.randn(2 * mmax, C, K).astype(np.float32))
    p = jnp.asarray(rng.randn(mmax, L, K).astype(np.float32) * 0.1)
    zl = jnp.asarray(rng.randn(2 * mmax, C, L).astype(np.float32))

    print(f"== legendre mmax{mmax} C{C} K{K} L{L}", flush=True)
    timeit("xla HIGH analysis", lambda v: jnp.einsum("mck,mlk->mcl", v.reshape(2 * mmax, C, K), p2_full(p), precision=H), z)
    for ps in (1, 3):
        timeit(f"pallas p{ps} analysis", lambda v, ps=ps: pallas_mm.legmm(v, p, passes=ps, contract="k"), z)
        timeit(f"pallas p{ps} synthesis", lambda v, ps=ps: pallas_mm.legmm(v, p, passes=ps, contract="l"), zl)

    ref = np.stack([np.asarray(z[g], np.float64) @ np.asarray(p[g % mmax], np.float64).T
                    for g in range(2 * mmax)])
    got = np.asarray(jax.jit(functools.partial(pallas_mm.legmm, passes=3, contract="k"))(z, p))
    print(f"pallas p3 analysis maxrel: {np.abs(got-ref).max()/np.abs(ref).max():.3e}", flush=True)


def bench_legendre2():
    """Paired layout: re/im of each mode adjacent -> z (mmax, 2C, K), table
    (mmax, L, K). legmm's m%mmax index map degenerates to identity (plain
    batched matmul, half the blocks, (2C,K)@(K,L) MXU shapes), vs the XLA
    forms the model actually runs (fused-transpose output) and the m-leading
    isolated form."""
    rng = np.random.RandomState(0)
    mmax, C, K, L = 241, 320, 240, 240
    zp = jnp.asarray(rng.randn(mmax, 2 * C, K).astype(np.float32))
    p = jnp.asarray(rng.randn(mmax, L, K).astype(np.float32) * 0.1)

    print(f"== legendre2 paired mmax{mmax} 2C{2*C} K{K} L{L}", flush=True)
    timeit("xla HIGH paired mck,mlk->mcl", lambda v: jnp.einsum(
        "mck,mlk->mcl", v, p, precision=H), zp)
    timeit("xla HIGH fused-T mck,mlk->clm", lambda v: jnp.einsum(
        "mck,mlk->clm", v, p, precision=H), zp)
    for ps in (2, 3):
        timeit(f"pallas p{ps} paired", lambda v, ps=ps: pallas_mm.legmm(
            v, p, passes=ps, contract="k"), zp)
    timeit("pallas p3 paired + moveaxis", lambda v: jnp.moveaxis(
        pallas_mm.legmm(v, p, passes=3, contract="k"), 0, -1), zp)

    ref = np.einsum("mck,mlk->mcl", np.asarray(zp, np.float64), np.asarray(p, np.float64))
    got = np.asarray(jax.jit(functools.partial(pallas_mm.legmm, passes=3, contract="k"))(zp, p))
    print(f"pallas p3 paired maxrel: {np.abs(got-ref).max()/np.abs(ref).max():.3e}", flush=True)


def p2_full(p):
    # duplicate table rows for the stacked re/im activation (XLA comparison)
    return jnp.concatenate([p, p], axis=0)


def bench_grid():
    rng = np.random.RandomState(0)
    for (R, K, N, tag) in [(320 * 721, 1440, 482, "full-res"),
                           (320 * 240, 480, 482, "inner")]:
        xb = jnp.asarray(rng.randn(R, K).astype(np.float32)).astype(jnp.bfloat16)
        xf = jnp.asarray(rng.randn(R, N).astype(np.float32))
        T = jnp.asarray(rng.randn(K, N).astype(np.float32))
        Ts = jnp.asarray(rng.randn(N, K).astype(np.float32))

        print(f"== grid {tag} analysis {R}x{K}@{K}x{N} bf16-act", flush=True)
        timeit("xla DEFAULT bf16", lambda x: jnp.einsum(
            "rk,kn->rn", x, T.astype(jnp.bfloat16), preferred_element_type=jnp.float32), xb)
        timeit("xla HIGH bf16act", lambda x: jnp.einsum("rk,kn->rn", x, T, precision=H), xb)
        for ps, tr in ((2, 512), (2, 1024), (3, 512)):
            timeit(f"pallas p{ps} tr{tr}", lambda x, ps=ps, tr=tr: pallas_mm.gridmm(
                x, T, passes=ps, tr=tr), xb)

        print(f"== grid {tag} synthesis {R}x{N}@{N}x{K} f32-act bf16-out", flush=True)
        timeit("xla DEFAULT", lambda z: jnp.einsum(
            "rm,mj->rj", z.astype(jnp.bfloat16), Ts.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), xf)
        timeit("xla HIGH f32", lambda z: jnp.einsum(
            "rm,mj->rj", z, Ts, precision=H).astype(jnp.bfloat16), xf)
        for ps, tr in ((3, 512), (3, 1024)):
            timeit(f"pallas p{ps} tr{tr} bf16out", lambda z, ps=ps, tr=tr: pallas_mm.gridmm(
                z, Ts, passes=ps, out_dtype=jnp.bfloat16, tr=tr), xf)

        ref = np.asarray(xf[:2048], np.float64) @ np.asarray(Ts, np.float64)
        got = np.asarray(jax.jit(functools.partial(pallas_mm.gridmm, passes=3))(xf[:2048], Ts))
        print(f"pallas p3 maxrel: {np.abs(got-ref).max()/np.abs(ref).max():.3e}", flush=True)


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if fam in ("dhconv", "all"):
        bench_dhconv()
    if fam in ("legendre", "all"):
        bench_legendre()
    if fam in ("legendre2", "all"):
        bench_legendre2()
    if fam in ("grid", "all"):
        bench_grid()
