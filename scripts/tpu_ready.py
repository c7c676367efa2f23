"""TPU readiness canary: block until the chip answers fast AND has capacity.

The axon relay cleans up a dead client's chip allocations LAZILY (minutes),
and a freshly-killed client can leave the claim slow to re-grant: a job
launched too early either OOMs on memory that will be free shortly or
crawls. Loop a tiny-op latency probe + an N-GB allocation probe until both
pass, then exit 0 (CLAUDE.md round-5 environment facts).

IMPORTANT: keep GB small (default 1). The canary's own allocations join
the lazy-free backlog the moment it exits — a 12 GB capacity probe run
right before a big job GUARANTEES the job OOMs (round-5 lesson). For a
full-chip job: gate on the tiny-op latency only, then wait the settle
period (~5 min) after ANY TPU process exits before launching.

Usage: python scripts/tpu_ready.py [GB=1] [max_wait_s=900]
"""

import subprocess
import sys
import time

PROBE = r'''
import time, jax, jax.numpy as jnp, numpy as np, sys
gb = int(sys.argv[1])
t0 = time.time()
b = jax.jit(lambda: jnp.ones((8,), jnp.float32) * 2)()
assert float(np.asarray(b)[0]) == 2.0
lat = time.time() - t0
# host->device PUT probe (the op that actually fails during relay
# degradation — round-5: batch puts RESOURCE_EXHAUST while jitted
# compute+fetch still works). 8 MB, materialized.
t0 = time.time()
p = jnp.asarray(np.ones((2, 1024, 1024), np.float32))
assert float(p[0, 0, 0]) == 1.0
put_lat = time.time() - t0
del p
bufs = []
for i in range(gb):
    bufs.append(jax.jit(lambda: jnp.ones((1024, 1024, 256), jnp.float32))())
    np.asarray(bufs[-1][0, 0, :2])
print(f"READY lat={lat:.1f} put={put_lat:.1f}", flush=True)
'''


def main():
    gb = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    max_wait = int(sys.argv[2]) if len(sys.argv) > 2 else 900
    t_start = time.time()
    attempt = 0
    while time.time() - t_start < max_wait:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE, str(gb)],
                capture_output=True, text=True, timeout=300)
            if "READY" in out.stdout:
                lat = float(out.stdout.split("lat=")[1].split()[0])
                if lat < 15.0:
                    print(f"tpu ready (attempt {attempt}, tiny-op {lat:.1f}s, "
                          f"{gb} GB allocatable)", flush=True)
                    return 0
                print(f"# chip slow (tiny-op {lat:.1f}s); retrying", flush=True)
            else:
                tail = (out.stdout + out.stderr).strip().splitlines()
                print(f"# not ready (attempt {attempt}): "
                      f"{tail[-1][:120] if tail else 'no output'}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"# probe timed out (attempt {attempt})", flush=True)
        time.sleep(60)
    print("tpu NOT ready within budget", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
