"""Flagship (edim384) multi-chip proof on the virtual 8-device mesh.

VERDICT gate: the canonical SFNO-73ch edim384 L8 sc3 flagship
(ref: /root/reference/config/sfnonet.yaml:162-173) has to be shown to
(a) compile + execute a full sharded train step with ZERO involuntary full
    rematerializations (replicate-then-slice reshard cliffs), and
(b) fit per-device on 16 GB chips at the full 721x1440 resolution by shape
    math (params + Adam state sharded per parallel/partitioning.py rules).

Spatial resolution is reduced for (a) because the step executes on CPU; the
channel/embed/layer dims are the real flagship ones. (b) is pure eval_shape
math at full resolution.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import comm

FLAGSHIP = dict(
    inp_chans=73, out_chans=73, embed_dim=384, num_layers=8, scale_factor=3,
    operator_type="dhconv", normalization_layer="instance_norm",
    use_mlp=True, mlp_ratio=2.0, big_skip=True,
)


def _build(inp_shape):
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
    return SphericalFourierNeuralOperatorNet(
        inp_shape=inp_shape, out_shape=inp_shape, **FLAGSHIP)


def _capture_compile_stderr(fn):
    """Run fn() while capturing fd 2 (the XLA C++ compiler logs there)."""
    import tempfile
    saved = os.dup(2)
    with tempfile.NamedTemporaryFile(mode="w+", delete=False) as f:
        os.dup2(f.fileno(), 2)
        try:
            result = fn()
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        f.seek(0)
        txt = open(f.name).read()
    os.unlink(f.name)
    # re-emit so the log stays visible
    import sys
    sys.stderr.write(txt)
    return result, txt


def test_flagship_sharded_train_step_no_involuntary_remat():
    """One full train step of the flagship dims on (h=2, w=2, fin=2):
    compiles warning-free and produces a finite loss."""
    import optax

    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 2, 1], devices=jax.devices()[:8])
    try:
        mesh = comm.get_mesh()
        H, W = 91, 180  # reduced spatial res (CPU); channel/embed dims real
        model = _build((H, W))
        tx = optax.adam(1e-3)

        x_shard = NamedSharding(mesh, P("data", None, "h", "w"))
        repl = NamedSharding(mesh, P())

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
            params = optax.apply_updates(params, updates)
            return params, opt_state2, loss

        rng = np.random.RandomState(0)
        # inputs enter batch-sharded; spatial sharding is established by the
        # in-graph constraints (explicit input shardings require divisibility)
        b_shard = NamedSharding(mesh, P("data"))
        x = jax.device_put(rng.randn(1, 73, H, W).astype(np.float32), b_shard)
        y = jax.device_put(rng.randn(1, 73, H, W).astype(np.float32), b_shard)
        params, opt_state = jax.jit(init_fn, out_shardings=(repl, repl))(
            jax.random.PRNGKey(0), x)

        from makani_tpu.parallel.partitioning import (
            get_opt_state_shardings, get_param_shardings, shard_tree)
        pshard = get_param_shardings(params, mesh)
        params = shard_tree(params, pshard)
        opt_state = shard_tree(
            opt_state, get_opt_state_shardings(opt_state, params, mesh))

        step = jax.jit(train_step, out_shardings=(pshard, None, repl))
        lowered = step.lower(params, opt_state, x, y)
        compiled, stderr_txt = _capture_compile_stderr(lowered.compile)

        n_remat = stderr_txt.count("Involuntary full rematerialization")
        assert n_remat == 0, f"{n_remat} involuntary remats in flagship step"

        params, opt_state, loss = compiled(params, opt_state, x, y)
        assert np.isfinite(float(loss))
    finally:
        comm.reset()


def test_flagship_full_res_state_fits_per_device():
    """721x1440 flagship params + Adam state sharded over (h=2, w=2, fin=2):
    per-device bytes by shape math must fit a 16 GB chip with generous room
    for activations (the real memory budget lever is the sharding rules)."""
    import optax

    comm.reset()
    comm.init(model_parallel_sizes=[2, 2, 2, 1], devices=jax.devices()[:8])
    try:
        mesh = comm.get_mesh()
        model = _build((721, 1440))
        x = jnp.zeros((1, 73, 721, 1440), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        tx = optax.adam(1e-3)
        opt_shapes = jax.eval_shape(tx.init, shapes["params"])

        from makani_tpu.parallel.partitioning import (
            get_opt_state_shardings, get_param_shardings)
        pshard = get_param_shardings(shapes["params"], mesh)
        oshard = get_opt_state_shardings(opt_shapes, shapes["params"], mesh)

        def per_device_bytes(shapes_tree, shardings_tree):
            """ceil-division shard byte math (GSPMD pads uneven dims)."""
            total = 0
            for leaf, sh in zip(jax.tree.leaves(shapes_tree),
                                jax.tree.leaves(shardings_tree)):
                if not hasattr(leaf, "shape") or not leaf.shape:
                    continue
                spec = tuple(sh.spec) + (None,) * (len(leaf.shape) - len(sh.spec))
                n = 1
                for s, entry in zip(leaf.shape, spec):
                    if entry is None:
                        parts = 1
                    else:
                        axes = entry if isinstance(entry, tuple) else (entry,)
                        parts = int(np.prod([mesh.shape[a] for a in axes]))
                    n *= -(-s // parts)
                total += n * leaf.dtype.itemsize
            return total

        pbytes = per_device_bytes(shapes["params"], pshard)
        obytes = per_device_bytes(opt_shapes, oshard)
        total_gb = (pbytes + obytes) / 1024**3

        # params must actually be sharded (not just replicated 8x)
        full_gb = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                      for l in jax.tree.leaves(shapes["params"])) / 1024**3
        assert pbytes / 1024**3 < 0.75 * full_gb, (
            "sharding rules leave params essentially replicated")
        # param+opt state well under the 16 GB chip (room for activations)
        assert total_gb < 8.0, f"per-device state {total_gb:.2f} GB too large"
    finally:
        comm.reset()
