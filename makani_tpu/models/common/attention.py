"""Memory-efficient scaled-dot-product attention.

The reference rides torch F.scaled_dot_product_attention (flash) for its ViT
attention (ref: makani/mpu/layers.py:512). The TPU-native equivalent here is
blockwise online-softmax attention expressed as a remat'd lax.scan over key
blocks (Rabe & Staats 2021 / FlashAttention recurrence):

  - memory drops from O(N^2) (a 16k-token 0.25-degree ViT would need ~8 GB
    of f32 logits per layer) to O(N * block_size);
  - every block step is a large MXU matmul pair, so XLA keeps the systolic
    array busy;
  - it stays plain HLO (no opaque custom call), so GSPMD still partitions
    batch and head dims — the head-parallel tensor-parallel sharding rules
    apply unchanged, unlike a Pallas kernel which the SPMD partitioner
    cannot split.

The softmax statistics (row max m, normalizer l) and the accumulator are
carried in f32 regardless of input dtype; the probability @ value matmul
runs in the input dtype (bf16 under AMP) like the reference's
SDPA-under-autocast.
"""

import jax
import jax.numpy as jnp


_DEFAULT_BLOCK_SIZE = 1024


def set_attention_block_size(n):
    """Global default key-block size for the blockwise recurrence (the
    on-chip tuning knob; swept in BENCH_MODE=vit via BENCH_BLOCK)."""
    global _DEFAULT_BLOCK_SIZE
    _DEFAULT_BLOCK_SIZE = int(n)


def scaled_dot_product_attention(q, k, v, scale=None, block_size=None,
                                 min_blockwise_tokens=2048):
    """Attention over (B, H, N, D) tensors; returns (B, H, N, D).

    Falls back to the materialized softmax for short sequences (cheaper than
    the scan machinery below ~2k tokens) and uses the blockwise recurrence
    beyond, padding N up to a block multiple.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    if block_size is None:
        block_size = _DEFAULT_BLOCK_SIZE

    if N <= min_blockwise_tokens:
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)

    nb = -(-N // block_size)
    Np = nb * block_size
    if Np != N:
        # pad keys/values; padded keys are masked out of the softmax
        pad = ((0, 0), (0, 0), (0, Np - N), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    kb = k.reshape(B, H, nb, block_size, D).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(B, H, nb, block_size, D).transpose(2, 0, 1, 3, 4)
    if Np != N:
        valid = (jnp.arange(Np) < N).reshape(nb, 1, 1, 1, block_size)
    else:
        valid = jnp.ones((nb, 1, 1, 1, block_size), dtype=bool)

    neg = jnp.float32(-1e30)

    @jax.checkpoint
    def body(carry, blk):
        acc, m, l = carry
        kblk, vblk, vld = blk
        s = jnp.einsum("bhnd,bhmd->bhnm", q, kblk,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(vld, s, neg)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhnm,bhmd->bhnd", p.astype(v.dtype), vblk,
            preferred_element_type=jnp.float32)
        return (acc, m_new, l), None

    acc0 = jnp.zeros((B, H, N, D), jnp.float32)
    m0 = jnp.full((B, H, N, 1), neg, jnp.float32)
    l0 = jnp.zeros((B, H, N, 1), jnp.float32)
    (acc, _, l), _ = jax.lax.scan(body, (acc0, m0, l0), (kb, vb, valid))
    return (acc / l).astype(q.dtype)
