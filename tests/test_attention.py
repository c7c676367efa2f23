"""Blockwise online-softmax attention (models/common/attention.py) vs the
materialized reference, forward and gradients — the memory-feasible analog
of the reference's F.scaled_dot_product_attention (ref: makani/mpu/
layers.py:512)."""

import numpy as np

import jax
import jax.numpy as jnp

from makani_tpu.models.common.attention import scaled_dot_product_attention


def _reference(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_blockwise_matches_reference_forward():
    B, H, N, D = 2, 3, 300, 16
    q, k, v = (_rand((B, H, N, D), s) for s in (0, 1, 2))
    ref = _reference(q, k, v, D ** -0.5)
    # force the blockwise path with a block that does NOT divide N (pads)
    got = scaled_dot_product_attention(q, k, v, block_size=128,
                                       min_blockwise_tokens=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_blockwise_matches_reference_grad():
    B, H, N, D = 1, 2, 256, 8
    q, k, v = (_rand((B, H, N, D), s) for s in (3, 4, 5))

    def loss_block(q, k, v):
        o = scaled_dot_product_attention(q, k, v, block_size=64,
                                         min_blockwise_tokens=0)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_reference(q, k, v, D ** -0.5)))

    g1 = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_short_sequences_use_materialized_path():
    B, H, N, D = 1, 2, 64, 8
    q, k, v = (_rand((B, H, N, D), s) for s in (6, 7, 8))
    got = scaled_dot_product_attention(q, k, v)  # N < min_blockwise_tokens
    ref = _reference(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_vit_forward_uses_fused_attention():
    """ViT forward unchanged numerically after the attention swap."""
    from makani_tpu.models.networks.vit import VisionTransformer

    model = VisionTransformer(inp_shape=(32, 64), patch_size=(8, 8),
                              inp_chans=3, out_chans=3, embed_dim=32,
                              depth=2, num_heads=4)
    x = _rand((1, 3, 32, 64), 9)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda p, v: model.apply(p, v))(params, x)
    assert np.isfinite(np.asarray(y)).all()
    assert y.shape == (1, 3, 32, 64)
