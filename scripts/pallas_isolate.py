"""Isolate which Pallas construct fails at runtime on the axon TPU relay.

Round-1 finding (BENCH_NOTES.md): the full dhconv kernel compiles but fails
at runtime with UNIMPLEMENTED, while a minimal single-output kernel runs.
This script bisects the feature set: each case is a tiny, fast-compiling
program; failures are caught and reported per case.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pallas_isolate.py
"""

import functools
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def run_case(name, fn):
    try:
        out = fn()
        outs = out if isinstance(out, (tuple, list)) else (out,)
        vals = [np.asarray(o) for o in outs]  # host materialize = real sync
        print(f"PASS {name}: " + ", ".join(str(v.shape) for v in vals), flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


C, O, M = 16, 16, 128


def case_copy():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((8, 128), jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    return jax.jit(f)(x)


def case_dot_plain():
    # standard (M,K)x(K,N) contraction, contracting dims (1),(0)
    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = jnp.ones((O, C), jnp.float32)
    b = jnp.ones((C, M), jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((O, M), jnp.float32))
    return jax.jit(f)(a, b)


def case_dot_transposed():
    # contracting dim 0 of BOTH operands (the dhconv kernel's dn)
    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = jnp.ones((C, O), jnp.float32)
    b = jnp.ones((C, M), jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((O, M), jnp.float32))
    return jax.jit(f)(a, b)


def case_grid_blocks():
    # 4D blockspecs + 3D grid with broadcast index maps (as in dhconv)
    B, L = 2, 4
    def k(x_ref, w_ref, o_ref):
        x = x_ref[0, 0]
        w = w_ref[0]
        o_ref[0, 0] = jax.lax.dot_general(
            w, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    x = jnp.ones((B, L, C, M), jnp.float32)
    w = jnp.ones((L, C, O), jnp.float32)
    f = pl.pallas_call(
        k, grid=(B, L, 1),
        in_specs=[pl.BlockSpec((1, 1, C, M), lambda b, l, m: (b, l, 0, m)),
                  pl.BlockSpec((1, C, O), lambda b, l, m: (l, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, O, M), lambda b, l, m: (b, l, 0, m)),
        out_shape=jax.ShapeDtypeStruct((B, L, O, M), jnp.float32))
    return jax.jit(f)(x, w)


def case_stacked_output():
    # 5D output block with leading stacked dim of 2 (the dhconv out layout)
    B, L = 2, 4
    def k(x_ref, w_ref, o_ref):
        x = x_ref[0, 0]
        w = w_ref[0]
        r = jax.lax.dot_general(w, x, dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, 0] = r
        o_ref[1, 0, 0] = -r
    x = jnp.ones((B, L, C, M), jnp.float32)
    w = jnp.ones((L, C, O), jnp.float32)
    f = pl.pallas_call(
        k, grid=(B, L, 1),
        in_specs=[pl.BlockSpec((1, 1, C, M), lambda b, l, m: (b, l, 0, m)),
                  pl.BlockSpec((1, C, O), lambda b, l, m: (l, 0, 0))],
        out_specs=pl.BlockSpec((2, 1, 1, O, M), lambda b, l, m: (0, b, l, 0, m)),
        out_shape=jax.ShapeDtypeStruct((2, B, L, O, M), jnp.float32))
    return jax.jit(f)(x, w)


def case_multi_output():
    # two separate outputs instead of the stacked one
    B, L = 2, 4
    def k(x_ref, w_ref, o1_ref, o2_ref):
        x = x_ref[0, 0]
        w = w_ref[0]
        r = jax.lax.dot_general(w, x, dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o1_ref[0, 0] = r
        o2_ref[0, 0] = -r
    x = jnp.ones((B, L, C, M), jnp.float32)
    w = jnp.ones((L, C, O), jnp.float32)
    spec = pl.BlockSpec((1, 1, O, M), lambda b, l, m: (b, l, 0, m))
    f = pl.pallas_call(
        k, grid=(B, L, 1),
        in_specs=[pl.BlockSpec((1, 1, C, M), lambda b, l, m: (b, l, 0, m)),
                  pl.BlockSpec((1, C, O), lambda b, l, m: (l, 0, 0))],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, L, O, M), jnp.float32)] * 2)
    return jax.jit(f)(x, w)


def case_bf16_split():
    # hi/lo bf16 split arithmetic inside the kernel
    def k(a_ref, b_ref, o_ref):
        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo
        def dot(a, b):
            return jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        ah, al = split(a_ref[...])
        bh, bl = split(b_ref[...])
        o_ref[...] = dot(ah, bh) + dot(ah, bl) + dot(al, bh)
    a = jnp.full((C, O), 1.234567, jnp.float32)
    b = jnp.full((C, M), 2.345678, jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((O, M), jnp.float32))
    return jax.jit(f)(a, b)


def case_dhconv_tiny():
    from makani_tpu.ops.pallas_kernels import contract_dhconv_pallas
    B, L = 2, 4
    def run(xp, wp):
        x = jax.lax.complex(xp[0], xp[1])
        w = jax.lax.complex(wp[0], wp[1])
        o = contract_dhconv_pallas(x, w)
        return jnp.real(o), jnp.imag(o)
    xp = jnp.ones((2, B, C, L, M), jnp.float32)
    wp = jnp.ones((2, C, O, L), jnp.float32)
    return jax.jit(run)(xp, wp)


def case_dhconv_grad():
    from makani_tpu.ops.pallas_kernels import contract_dhconv_pallas
    B, L = 2, 4
    def loss(xp, wp):
        x = jax.lax.complex(xp[0], xp[1])
        w = jax.lax.complex(wp[0], wp[1])
        o = contract_dhconv_pallas(x, w)
        return jnp.sum(jnp.abs(o) ** 2)
    xp = jnp.ones((2, B, C, L, M), jnp.float32) * 0.1
    wp = jnp.ones((2, C, O, L), jnp.float32) * 0.1
    return jax.jit(jax.grad(loss, argnums=(0, 1)))(xp, wp)


CASES = [
    ("copy", case_copy),
    ("dot_plain", case_dot_plain),
    ("dot_transposed", case_dot_transposed),
    ("grid_blocks", case_grid_blocks),
    ("stacked_output_5d", case_stacked_output),
    ("multi_output", case_multi_output),
    ("bf16_split", case_bf16_split),
    ("dhconv_tiny", case_dhconv_tiny),
    ("dhconv_grad", case_dhconv_grad),
]

if __name__ == "__main__":
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    print("devices:", jax.devices(), flush=True)
    for name, fn in CASES:
        if only and name not in only:
            continue
        run_case(name, fn)
