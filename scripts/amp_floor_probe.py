"""Model-level probe: is mixed-vs-high output difference below the bf16 AMP
floor? Runs a small SFNO forward on the chip in three configs."""
import subprocess, sys, os, json

SCRIPT = r'''
import os, sys, json
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
mode, amp = sys.argv[1], sys.argv[2] == "amp"
from makani_tpu.ops.sht import set_transform_precision
from makani_tpu.ops.complex_ops import set_contraction_precision
set_transform_precision(mode); set_contraction_precision(mode)
from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
m = SphericalFourierNeuralOperatorNet(inp_shape=(121,240), out_shape=(121,240),
        scale_factor=2, inp_chans=8, out_chans=8, embed_dim=64, num_layers=4,
        operator_type="dhconv", use_mlp=True, big_skip=True)
x = jnp.asarray(np.random.RandomState(0).randn(1,8,121,240).astype(np.float32))
if amp: x = x.astype(jnp.bfloat16)
p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
y = jax.jit(lambda p, v: m.apply(p, v))(p, x)
np.save(f"/tmp/amp_probe_{mode}_{'amp' if amp else 'f32'}.npy",
        np.asarray(y.astype(jnp.float32)))
print("done", mode, amp)
'''
env = dict(os.environ); env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
for mode, amp in [("high","f32"), ("high","amp"), ("mixed","amp"), ("default","amp")]:
    r = subprocess.run([sys.executable, "-c", SCRIPT, mode, amp],
                       env=env, capture_output=True, text=True, timeout=1700)
    print(mode, amp, r.returncode, r.stdout.strip()[-40:], r.stderr.strip()[-200:] if r.returncode else "")

import numpy as np
ref = np.load("/tmp/amp_probe_high_f32.npy"); s = np.abs(ref).max()
for tag in ["high_amp", "mixed_amp", "default_amp"]:
    d = np.load(f"/tmp/amp_probe_{tag.replace('_amp','')}_amp.npy")
    print(f"{tag:12s} maxrel vs high/f32: {np.abs(d-ref).max()/s:.3e}")
hi = np.load("/tmp/amp_probe_high_amp.npy")
for tag in ["mixed", "default"]:
    d = np.load(f"/tmp/amp_probe_{tag}_amp.npy")
    print(f"{tag:8s} maxrel vs high(AMP): {np.abs(d-hi).max()/s:.3e}")
