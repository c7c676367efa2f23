"""HLO collective census of the distributed train step (round-5 verdict #2).

The spatial-MP design expresses the reference's explicit all-to-all
transposes (ref: makani/mpu/layers.py:34-102) as GSPMD sharding
constraints (parallel/spmd.py + ops/sht.py distributed branches). GSPMD is
free to satisfy a constraint transition with a full-field all-gather —
numerically identical, catastrophically worse at pod scale (O(field) bytes
instead of O(field/N)). This script compiles the sharded step on a virtual
CPU mesh and censuses the collectives in the partitioned HLO so the
lowering is a measured fact, not an assumption.

Run: python scripts/collective_census.py [n_devices] [--full]
"""

import os
import re
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    f"--xla_force_host_platform_device_count={int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8}",
)

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(f64|f32|f16|bf16|s64|u64|s32|u32|s16|u16|s8|u8|pred|c64|c128)\[([0-9,]*)\]")
_COLLECTIVES = ("all-to-all", "all-gather", "all-reduce", "reduce-scatter",
                "collective-permute")


def _shape_bytes(text):
    """Sum byte sizes of every shape literal in an HLO result type string."""
    total = 0
    for m in _SHAPE_RE.finditer(text):
        dims = m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[m.group(1)]
    return total


def census_hlo(hlo_text):
    """Collective census of a (post-SPMD-partitioning, per-device) HLO module.

    Returns {op_kind: {"count": n, "bytes": total_result_bytes,
    "max_bytes": largest_single_result}} plus per-op shape details for the
    largest few. `-start` / `-done` async pairs are counted once (at start).
    """
    out = {}
    details = []
    for line in hlo_text.splitlines():
        line = line.strip()
        # result-var form: "%name = TYPE op-name(...)"
        m = re.match(r"%?[\w.\-]+ = (.+?) ([\w\-]+)\(", line)
        if not m:
            continue
        op = m.group(2)
        base = op
        for suffix in ("-start", "-done"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
        if base not in _COLLECTIVES:
            continue
        if op.endswith("-done"):
            continue  # counted at -start
        nbytes = _shape_bytes(m.group(1))
        rec = out.setdefault(base, {"count": 0, "bytes": 0, "max_bytes": 0})
        rec["count"] += 1
        rec["bytes"] += nbytes
        rec["max_bytes"] = max(rec["max_bytes"], nbytes)
        details.append((base, nbytes, line[:160]))
    details.sort(key=lambda d: -d[1])
    return out, details


def build_step(n_devices, full=False):
    """The dryrun's sharded train step (data x h x w [x fin]) lowered for
    the virtual mesh; returns (lowered, model_facts)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from makani_tpu.parallel import comm
    from makani_tpu.parallel.partitioning import (
        get_param_shardings, get_opt_state_shardings, shard_tree)
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    if n_devices % 8 == 0:
        sizes = dict(h=2, w=2, fin=2, fout=1)
    elif n_devices % 4 == 0:
        sizes = dict(h=2, w=2, fin=1, fout=1)
    else:
        sizes = dict(h=2, w=1, fin=1, fout=1)

    comm.reset()
    comm.init(model_parallel_sizes=[sizes["h"], sizes["w"], sizes["fin"], sizes["fout"]],
              model_parallel_names=["h", "w", "fin", "fout"],
              devices=jax.devices()[:n_devices])
    mesh = comm.get_mesh()

    if full:
        C, H, W, E, L, SF = 73, 721, 1440, 384, 8, 3
    else:
        # flagship-SHAPED, compile-friendly: same channel/embed ratios and
        # the same sharding-transition structure, smaller grid
        C, H, W, E, L, SF = 16, 90, 180, 48, 2, 3

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(H, W), out_shape=(H, W), scale_factor=SF,
        inp_chans=C, out_chans=C, embed_dim=E, num_layers=L,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, mlp_ratio=2.0, big_skip=True)

    tx = optax.adam(1e-3)
    x_shard = NamedSharding(mesh, P("data", None, "h", "w"))
    repl = NamedSharding(mesh, P())
    B = comm.get_size("data")

    def init_fn(key, x):
        variables = model.init(key, x)
        return variables["params"], tx.init(variables["params"])

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            pred = jax.lax.with_sharding_constraint(pred, x_shard)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    x = jax.device_put(np.random.RandomState(0).randn(B, C, H, W).astype(np.float32), x_shard)
    y = jax.device_put(np.random.RandomState(1).randn(B, C, H, W).astype(np.float32), x_shard)
    params, opt_state = jax.jit(init_fn, out_shardings=(repl, repl))(jax.random.PRNGKey(0), x)
    pshard = get_param_shardings(params, mesh)
    params = shard_tree(params, pshard)
    opt_state = shard_tree(opt_state, get_opt_state_shardings(opt_state, params, mesh))

    lowered = jax.jit(train_step, out_shardings=(pshard, None, repl)).lower(
        params, opt_state, x, y)
    facts = dict(B=B, C=C, H=H, W=W, E=E, L=L,
                 spatial=sizes["h"] * sizes["w"], sizes=sizes)
    return lowered, facts


def main():
    full = "--full" in sys.argv
    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8

    lowered, facts = build_step(n_devices, full=full)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts, details = census_hlo(hlo)

    print(f"mesh: {facts['sizes']} over {n_devices} devices; "
          f"model C={facts['C']} H={facts['H']} W={facts['W']} E={facts['E']} L={facts['L']}")
    field = facts["B"] * facts["E"] * facts["H"] * facts["W"] * 4
    print(f"full embed-field bytes (global, f32): {field/1e6:.2f} MB; "
          f"per-device shard: {field/n_devices/1e6:.3f} MB")
    for k in sorted(counts):
        v = counts[k]
        print(f"{k:20s} count={v['count']:4d} total={v['bytes']/1e6:10.3f} MB "
              f"max={v['max_bytes']/1e6:10.3f} MB")
    print("\ntop ops:")
    for kind, nbytes, line in details[:15]:
        print(f"  {nbytes/1e6:10.3f} MB  {line}")


if __name__ == "__main__":
    main()
