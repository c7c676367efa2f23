"""Micro-benchmark: Pallas dhconv kernel vs jnp einsum path, flagship shapes.

Times fwd and fwd+bwd of the complex per-l channel mixing
out[b,o,l,m] = sum_i w[i,o,l] x[b,i,l,m] at SFNO-73ch edim320 sc3 inner-grid
shapes (B=1, C=O=320, L=240, M=241). Complex stays inside jit (axon relay
cannot transfer complex64); sync by host-materializing a scalar.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_dhconv.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.ops import complex_ops

B = int(os.environ.get("B", 1))
C = int(os.environ.get("C", 320))
L = int(os.environ.get("L", 240))
M = int(os.environ.get("M", 241))
ITERS = int(os.environ.get("ITERS", 30))
CHAIN = int(os.environ.get("CHAIN", 8))


def make_fns(use_pallas):
    def dhconv(xp, wp):
        complex_ops.enable_pallas_kernels(use_pallas)
        x = jax.lax.complex(xp[0], xp[1])
        w = jax.lax.complex(wp[0], wp[1])
        o = complex_ops.contract_dhconv(x, w)
        return jnp.stack([jnp.real(o), jnp.imag(o)])

    def fwd_chain(xp, wp):
        o = xp
        for _ in range(CHAIN):
            o = dhconv(o, wp)[:, :, :C]
        return jnp.sum(o * o)

    def loss(xp, wp):
        return fwd_chain(xp, wp)

    return jax.jit(fwd_chain), jax.jit(jax.grad(loss, argnums=(0, 1)))


def timeit(fn, args, n):
    out = fn(*args)
    s = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), out, 0.0)
    float(s)  # warm-up + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), out, 0.0)
    float(s)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(2, B, C, L, M).astype(np.float32) * 0.1)
    wp = jnp.asarray(rng.randn(2, C, C, L).astype(np.float32) * 0.05)

    # numerics check (fwd) jnp vs pallas
    f_jnp, g_jnp = make_fns(False)
    f_pal, g_pal = make_fns(True)

    def one(use_pallas):
        def dh(xp, wp):
            complex_ops.enable_pallas_kernels(use_pallas)
            x = jax.lax.complex(xp[0], xp[1])
            w = jax.lax.complex(wp[0], wp[1])
            o = complex_ops.contract_dhconv(x, w)
            return jnp.stack([jnp.real(o), jnp.imag(o)])
        return jax.jit(dh)(xp, wp)

    a = np.asarray(one(False))
    b = np.asarray(one(True))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-30)
    print(f"max rel diff jnp-vs-pallas fwd: {err:.3e}", flush=True)

    # FLOPs per dhconv: complex C->C at L*M points = 8*C*C*L*M (4 real mults
    # via 3M trick ~ 6) — report both wall time and effective TF/s (logical 8).
    flops = 8.0 * B * C * C * L * M * CHAIN

    for name, (f, g) in (("jnp", (f_jnp, g_jnp)), ("pallas", (f_pal, g_pal))):
        tf = timeit(f, (xp, wp), ITERS)
        tg = timeit(g, (xp, wp), max(ITERS // 2, 5))
        print(f"{name:7s} fwd {tf*1e3:8.2f} ms ({flops/tf/1e12:6.2f} TF/s logical)   "
              f"fwd+bwd {tg*1e3:8.2f} ms ({3*flops/tg/1e12:6.2f} TF/s logical)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), "precision:", complex_ops._PRECISION, flush=True)
    main()
