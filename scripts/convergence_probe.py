"""Training-convergence evidence for the 'mixed' AMP default: run the same
small SFNO training job on-chip at transform_precision high vs mixed
(fresh process per mode — precision globals are trace-cached) and compare
loss trajectories.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/convergence_probe.py
"""

import json
import os
import subprocess
import sys

SCRIPT = r'''
import sys, json
import numpy as np, jax, jax.numpy as jnp
import optax
sys.path.insert(0, "/root/repo")
mode = sys.argv[1]
from makani_tpu.ops.sht import set_transform_precision
from makani_tpu.ops.complex_ops import set_contraction_precision
set_transform_precision(mode); set_contraction_precision(mode)
from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

m = SphericalFourierNeuralOperatorNet(
    inp_shape=(121, 240), out_shape=(121, 240), scale_factor=2,
    inp_chans=8, out_chans=8, embed_dim=64, num_layers=4,
    operator_type="dhconv", use_mlp=True, big_skip=True)

rng = np.random.RandomState(0)
# synthetic AR task: smooth random fields, target = rolled + noised input
xs = rng.randn(16, 8, 121, 240).astype(np.float32)
ys = np.roll(xs, 3, axis=-1) * 0.9 + 0.1 * rng.randn(16, 8, 121, 240).astype(np.float32)
xs_d = jnp.asarray(xs).astype(jnp.bfloat16)
ys_d = jnp.asarray(ys)

tx = optax.adam(2e-4)
params = jax.jit(m.init)(jax.random.PRNGKey(0), xs_d[:1])["params"]
opt_state = jax.jit(tx.init)(params)

def step(params, opt_state, x, y):
    def loss_fn(p):
        pred = m.apply({"params": p}, x).astype(jnp.float32)
        return jnp.mean((pred - y) ** 2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

jstep = jax.jit(step, donate_argnums=(0, 1))
losses = []
for it in range(60):
    i = it % 16
    params, opt_state, loss = jstep(params, opt_state, xs_d[i:i+1], ys_d[i:i+1])
    losses.append(float(loss))
print("LOSSES", json.dumps(losses))
'''


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
    curves = {}
    for mode in ("high", "mixed"):
        r = subprocess.run([sys.executable, "-c", SCRIPT, mode],
                           env=env, capture_output=True, text=True, timeout=1700)
        for line in r.stdout.splitlines():
            if line.startswith("LOSSES"):
                curves[mode] = json.loads(line.split(" ", 1)[1])
        if mode not in curves:
            print(f"{mode} FAILED:", r.stderr[-400:])
            return
    import numpy as np
    h, x = np.array(curves["high"]), np.array(curves["mixed"])
    print(f"high : first {h[0]:.4f}  last5 mean {h[-5:].mean():.4f}")
    print(f"mixed: first {x[0]:.4f}  last5 mean {x[-5:].mean():.4f}")
    print(f"final-loss ratio mixed/high: {x[-5:].mean()/h[-5:].mean():.4f}")
    print(f"curve max abs rel diff: {np.abs(x-h).max()/np.abs(h).max():.3e}")


if __name__ == "__main__":
    main()
