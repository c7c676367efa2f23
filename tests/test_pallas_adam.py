"""Fused Pallas Adam kernel vs the unfused optax path.

The fused kernel (ops/pallas_adam.py) must be BIT-equivalent to
scale_by_adam_lowmem + ``p*(1-lr*wd) - lr*u`` — same moment math, same
counter-hash stochastic rounding on the same flat element indices — so the
round-4 convergence qualification of the lowmem optimizer transfers to the
fused path unchanged. Runs the pallas interpreter on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from makani_tpu.ops.pallas_adam import fused_adam_apply
from makani_tpu.utils.optimizers import scale_by_adam_lowmem, fused_adam_settings


def _tree(rng, scale=1.0):
    # odd shapes exercise the lane padding; include a >1-block leaf
    return {
        "a": jnp.asarray(rng.randn(7).astype(np.float32)) * scale,
        "b": {"w": jnp.asarray(rng.randn(3, 65).astype(np.float32)) * scale,
              "v": jnp.asarray(rng.randn(2, 3, 129).astype(np.float32)) * scale},
    }


def _xla_step(tx, params, grads, opt_state, lr, wd=0.0):
    updates, new_state = tx.update(grads, opt_state, params)
    if wd:
        updates = jax.tree.map(lambda u, p: u + wd * p, updates, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u.astype(p.dtype),
                              params, updates)
    return new_params, new_state


@pytest.mark.parametrize("steps", [3])
def test_fused_matches_lowmem_bf16_bitwise(steps):
    rng = np.random.RandomState(0)
    params = _tree(rng)
    tx = scale_by_adam_lowmem(b1=0.9, b2=0.95, eps=1e-8,
                              moment_dtype=jnp.bfloat16, seed=340)
    s_x = jax.jit(tx.init)(params)
    s_f = s_x
    p_x = p_f = params
    lr = 1e-3

    xla = jax.jit(lambda p, s, g: _xla_step(tx, p, g, s, lr))
    fused = jax.jit(lambda p, s, g: fused_adam_apply(
        p, g, s, lr, b1=0.9, b2=0.95, eps=1e-8, seed=340))

    for it in range(steps):
        grads = _tree(np.random.RandomState(100 + it), scale=0.1)
        p_x, s_x = xla(p_x, s_x, grads)
        p_f, s_f = fused(p_f, s_f, grads)

    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments bit-identical: same stochastic-rounding hash stream
    for a, b in zip(jax.tree.leaves((s_x.mu, s_x.nu)),
                    jax.tree.leaves((s_f.mu, s_f.nu))):
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32))
    assert int(s_f.count) == steps


def test_fused_matches_f32_adam():
    rng = np.random.RandomState(1)
    params = _tree(rng)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    state = jax.jit(tx.init)(params)
    grads = _tree(np.random.RandomState(2), scale=0.1)
    lr = 3e-4

    p_x, s_x = jax.jit(lambda p, s, g: _xla_step(tx, p, g, s, lr))(params, state, grads)
    p_f, s_f = jax.jit(lambda p, s, g: fused_adam_apply(
        p, g, s, lr, b1=0.9, b2=0.999, eps=1e-8,
        stochastic_rounding=False))(params, state, grads)

    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves((s_x.mu, s_x.nu)),
                    jax.tree.leaves((s_f.mu, s_f.nu))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_fused_weight_decay():
    """AdamW: decoupled decay folded into the kernel as p*(1-lr*wd)."""
    rng = np.random.RandomState(3)
    params = _tree(rng)
    tx = optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8)
    state = jax.jit(tx.init)(params)
    grads = _tree(np.random.RandomState(4), scale=0.1)
    lr, wd = 1e-3, 0.01

    p_x, _ = jax.jit(lambda p, s, g: _xla_step(tx, p, g, s, lr, wd=wd))(
        params, state, grads)
    p_f, _ = jax.jit(lambda p, s, g: fused_adam_apply(
        p, g, s, lr, b1=0.9, b2=0.95, eps=1e-8, weight_decay=wd,
        stochastic_rounding=False))(params, state, grads)

    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_fused_settings_gating():
    class P(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    base = P(optimizer_fused=True, optimizer_type="Adam",
             optimizer_moment_dtype="bfloat16", optimizer_beta1=0.9,
             optimizer_beta2=0.999, global_seed=333)
    kw = fused_adam_settings(base)
    assert kw is not None and kw["seed"] == 340 and kw["stochastic_rounding"]

    assert fused_adam_settings(P(base, optimizer_fused=False)) is None
    assert fused_adam_settings(P(base, optimizer_type="LAMB")) is None
    assert fused_adam_settings(P(base, gradient_clip_norm=1.0)) is None
    # f32 moments: eligible, but no stochastic rounding
    kw32 = fused_adam_settings(P(base, optimizer_moment_dtype="float32"))
    assert kw32 is not None and not kw32["stochastic_rounding"]
    # AdamW carries decoupled weight decay into the kernel
    kww = fused_adam_settings(P(base, optimizer_type="AdamW", weight_decay=0.05))
    assert kww is not None and kww["weight_decay"] == 0.05


def test_bf16_norm_stats_close_to_f32():
    """The bf16-stat InstanceNorm (one-pass, f32 accumulation) must track
    the exact f32 two-pass norm to bf16 rounding tolerance."""
    from makani_tpu.models.common.layers import InstanceNorm2d, set_norm_stats_mode

    rng = np.random.RandomState(0)
    x = (rng.randn(2, 4, 24, 48) * 1.7 + 0.6).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    m = InstanceNorm2d(num_features=4)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), xb)
    try:
        set_norm_stats_mode("f32")
        ref = np.asarray(jax.jit(m.apply)(v, xb), dtype=np.float32)
        set_norm_stats_mode("bf16")
        got = np.asarray(jax.jit(m.apply)(v, xb), dtype=np.float32)
    finally:
        set_norm_stats_mode("f32")
    # bf16 elementwise pipeline: ~8-bit mantissa rounding of O(1) values
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    assert np.abs(got.mean()) < 0.05 and abs(got.std() - 1.0) < 0.1
