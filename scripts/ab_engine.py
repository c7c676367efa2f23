"""A/B the coefficient engines (xla complex vs stacked real planes) in ONE
process: same model, fresh step def per engine (jit caches on the function
object — see CLAUDE.md), AUTO layouts like bench.py, optional traces.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_engine.py
Env: AB_EMBED (320), AB_LAYERS (4), AB_ITERS (10), AB_PRECISION (mixed),
     AB_TRACE_DIR (no traces if unset), AB_ENGINES (comma list).
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from makani_tpu.ops.sht import (set_transform_precision, set_coeff_engine,
                                    materialize_tables, provided_tables)
    from makani_tpu.ops.complex_ops import set_contraction_precision
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet
    from makani_tpu.utils.layouts import compile_with_auto_layouts, reput_tree

    embed = int(os.environ.get("AB_EMBED", 320))
    layers = int(os.environ.get("AB_LAYERS", 4))
    n_iters = int(os.environ.get("AB_ITERS", 10))
    prec = os.environ.get("AB_PRECISION", "mixed")
    trace_dir = os.environ.get("AB_TRACE_DIR")
    engines = os.environ.get("AB_ENGINES", "xla,stacked").split(",")

    set_transform_precision(prec)
    set_contraction_precision(prec)

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(721, 1440), out_shape=(721, 1440), scale_factor=3,
        inp_chans=73, out_chans=73, embed_dim=embed, num_layers=layers,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, mlp_ratio=2.0, activation_function="gelu",
        hard_thresholding_fraction=1.0, big_skip=True, checkpointing=2)

    tx = optax.chain(optax.clip_by_global_norm(32.0), optax.adam(1e-3))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 73, 721, 1440).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randn(1, 73, 721, 1440).astype(np.float32))

    t0 = time.time()
    params0, opt0 = jax.jit(lambda k, v: (
        lambda p: (p, tx.init(p)))(model.init(k, v)["params"]))(jax.random.PRNGKey(0), x)
    jax.block_until_ready(params0)
    print(f"# init {time.time()-t0:.0f}s", flush=True)

    results = {}
    state = (params0, opt0)
    for eng in engines:
        set_coeff_engine(eng)

        def train_step(params, opt_state, x, y):
            def loss_fn(p):
                pred = model.apply({"params": p}, x).astype(jnp.float32)
                return jnp.mean((pred - y) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        tables = materialize_tables(train_step, *state, x, y)

        def step_t(params, opt_state, x, y, tables):
            with provided_tables(tables):
                return train_step(params, opt_state, x, y)

        t0 = time.time()
        compiled, in_fmts = compile_with_auto_layouts(
            step_t, (*state, x, y, tables), donate_argnums=(0, 1))
        print(f"# [{eng}] compiled in {time.time()-t0:.0f}s", flush=True)
        st = tuple(reput_tree(a, f) for a, f in zip((*state, x, y, tables), in_fmts))
        params, opt_state, xe, ye, tabs = st

        params, opt_state, loss = compiled(params, opt_state, xe, ye, tabs)
        float(loss)

        if trace_dir:
            with jax.profiler.trace(os.path.join(trace_dir, eng)):
                for _ in range(2):
                    params, opt_state, loss = compiled(params, opt_state, xe, ye, tabs)
                float(loss)

        t0 = time.perf_counter()
        for _ in range(n_iters):
            params, opt_state, loss = compiled(params, opt_state, xe, ye, tabs)
        float(loss)
        dt = time.perf_counter() - t0
        results[eng] = n_iters / dt
        print(f"[{eng}] {results[eng]:.4f} steps/s", flush=True)
        # hand the live state to the next engine (reput_tree re-lays it out);
        # drop every other device reference BEFORE the next compile so the
        # chip never holds two copies of params+optimizer
        import gc
        state = (params, opt_state)
        del params, opt_state, xe, ye, tabs, st, compiled, in_fmts, tables
        gc.collect()

    print({k: round(v, 4) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
