"""Training-convergence evidence for the transform-precision AMP default:
run the same small SFNO training job on-chip for each requested
transform-precision mode (fresh process per mode — precision globals are
trace-cached) and compare (a) loss trajectories and (b) a short-rollout
anomaly-correlation score on a held-out initial condition.

Round-3 verdict item: 'mixed' (3-pass bf16 on transforms, 1-pass elsewhere)
was qualified vs 'high'; the ~18%-faster 'default' (1-pass bf16 everywhere)
point was unqualified. This probe runs high/mixed/default/mixed2 in one go.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/convergence_probe.py [modes...]
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
print("LOSSES", json.dumps(losses), flush=True)

# short-rollout anomaly correlation on a held-out IC: truth = the noise-free
# synthetic map iterated; model rolled out autoregressively from the same IC
x0 = rng.randn(1, 8, 121, 240).astype(np.float32)
fwd = jax.jit(lambda p, v: m.apply({"params": p}, v.astype(jnp.bfloat16)).astype(jnp.float32))
truth = x0.copy()
state = jnp.asarray(x0)
accs = []
for s in range(5):
    truth = np.roll(truth, 3, axis=-1) * 0.9
    state = fwd(params, state)
    g = np.asarray(state).ravel(); t = truth.ravel()
    ga = g - g.mean(); ta = t - t.mean()
    accs.append(float((ga * ta).sum() / np.sqrt((ga**2).sum() * (ta**2).sum())))
print("ACCS", json.dumps(accs), flush=True)
'''


def main():
    modes = sys.argv[1:] or ["high", "mixed", "default", "mixed2"]
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
    curves, accs = {}, {}
    for mode in modes:
        r = subprocess.run([sys.executable, "-c", SCRIPT, mode],
                           env=env, capture_output=True, text=True, timeout=1700)
        for line in r.stdout.splitlines():
            if line.startswith("LOSSES"):
                curves[mode] = json.loads(line.split(" ", 1)[1])
            if line.startswith("ACCS"):
                accs[mode] = json.loads(line.split(" ", 1)[1])
        if mode not in curves:
            print(f"{mode} FAILED:", r.stderr[-400:])
            return
        import numpy as np
        c = np.array(curves[mode])
        print(f"{mode:8s}: first {c[0]:.4f}  last5 mean {c[-5:].mean():.4f}  "
              f"rollout ACC {['%.4f' % a for a in accs.get(mode, [])]}", flush=True)

    import numpy as np
    ref = np.array(curves[modes[0]])
    print(f"\nvs {modes[0]}:")
    for mode in modes[1:]:
        c = np.array(curves[mode])
        print(f"  {mode:8s}: final-loss ratio {c[-5:].mean()/ref[-5:].mean():.4f}  "
              f"curve max abs rel diff {np.abs(c-ref).max()/np.abs(ref).max():.3e}  "
              f"ACC delta {np.array(accs[mode]) - np.array(accs[modes[0]])}")


if __name__ == "__main__":
    main()
