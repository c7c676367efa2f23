"""Versioned async checkpointing + cross-mesh (flexible) restore.

VERDICT r1 item 9: orbax CheckpointManager with async save and keep-N, plus
a test restoring state onto a DIFFERENT mesh layout (the reference's
flexible-restore re-split, ref: makani/utils/trainer.py:971-1021,1056-1098).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from makani_tpu.utils import checkpoint as ckpt_lib


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.randn(8, 16).astype(np.float32)),
                  "bias": jnp.asarray(rng.randn(16).astype(np.float32))},
        "filter": {"weight": jnp.asarray(rng.randn(4, 8, 6, 2).astype(np.float32))},
    }


def test_training_checkpointer_keep_n_and_resume(tmp_path):
    root = str(tmp_path / "ckpt")
    mgr = ckpt_lib.TrainingCheckpointer(root, max_to_keep=2)
    trees = {}
    for epoch in range(1, 5):
        trees[epoch] = _tree(epoch)
        mgr.save(epoch, trees[epoch], counters={"epoch": epoch, "iters": epoch * 10})
    mgr.wait()

    # keep-N retention: only the 2 newest steps survive
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    assert steps == [3, 4]
    assert mgr.latest_step() == 4

    # manager restore
    params, opt_state, counters = mgr.restore(jax.tree.map(jnp.zeros_like, trees[4]))
    assert counters == {"epoch": 4, "iters": 40}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(trees[4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the generic restore path resolves a versioned root to its latest step
    # (what the train CLI's resume detection + Inferencer use)
    assert ckpt_lib.checkpoint_exists(root)
    params2, _, counters2 = ckpt_lib.restore_checkpoint(
        root, jax.tree.map(jnp.zeros_like, trees[4]))
    assert counters2["epoch"] == 4
    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(trees[4])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_cross_mesh_restore(tmp_path):
    """Save sharded on mesh A (channel-parallel), restore onto mesh B
    (spatial layout) — values must round-trip exactly."""
    path = str(tmp_path / "xmesh")
    devices = jax.devices()[:8]

    tree = _tree(7)
    mesh_a = Mesh(np.asarray(devices).reshape(2, 4), ("fin", "fout"))
    spec_a = {"dense": {"kernel": P("fin", "fout"), "bias": P("fout")},
              "filter": {"weight": P("fin", "fout", None, None)}}
    tree_a = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh_a, s)), tree, spec_a,
        is_leaf=lambda x: isinstance(x, P))

    ckpt_lib.save_checkpoint(path, tree_a, background=False)

    mesh_b = Mesh(np.asarray(devices).reshape(4, 2), ("h", "w"))
    spec_b = {"dense": {"kernel": P("h", "w"), "bias": P(None)},
              "filter": {"weight": P("h", "w", None, None)}}
    template = jax.tree.map(
        lambda x, s: jax.device_put(jnp.zeros_like(x), NamedSharding(mesh_b, s)),
        tree, spec_b, is_leaf=lambda x: isinstance(x, P))

    restored, _, _ = ckpt_lib.restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored onto the NEW mesh/sharding
    for leaf in jax.tree.leaves(restored):
        assert leaf.sharding.mesh.axis_names == ("h", "w")


def test_async_best_checkpoint_overwrite(tmp_path):
    """Single-dir async saves overwrite atomically (best-checkpoint path)."""
    path = str(tmp_path / "best")
    t1, t2 = _tree(1), _tree(2)
    ckpt_lib.save_checkpoint(path, t1, counters={"epoch": 1})
    ckpt_lib.save_checkpoint(path, t2, counters={"epoch": 2})
    restored, _, counters = ckpt_lib.restore_checkpoint(
        path, jax.tree.map(jnp.zeros_like, t2))
    assert counters == {"epoch": 2}
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(t2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
