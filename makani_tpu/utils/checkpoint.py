"""Checkpoint save/restore.

The reference has two formats (ref: makani/utils/trainer.py:936-1098):
"legacy" per-mp-rank full dicts and "flexible" gather-to-rank0 files that can
be restored onto any model-parallel layout. With JAX + orbax, the flexible
semantics come for free: checkpoints store the *global* logical arrays and
restore re-shards onto whatever mesh/sharding the restore target uses.
"""

import json
import os
from typing import Any, Optional

import numpy as np
import jax
import orbax.checkpoint as ocp


def _counters_path(path):
    return os.path.join(path, "counters.json")


def save_checkpoint(path, params, opt_state=None, counters: Optional[dict] = None):
    """Save a training checkpoint (model params + optimizer state + counters)."""
    path = os.path.abspath(path)
    ckpt = {"model": params}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state

    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        # orbax refuses to overwrite; emulate torch.save semantics
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, ckpt)
    ckptr.wait_until_finished()

    if counters is not None:
        with open(_counters_path(path), "w") as f:
            json.dump(counters, f)


def restore_checkpoint(path, params_template, opt_state_template=None):
    """Restore onto the given templates (shape/dtype/sharding donors).
    Returns (params, opt_state_or_None, counters_dict)."""
    path = os.path.abspath(path)
    item = {"model": params_template}
    if opt_state_template is not None:
        item["opt_state"] = opt_state_template

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=item)

    counters = {}
    cpath = _counters_path(path)
    if os.path.exists(cpath):
        with open(cpath) as f:
            counters = json.load(f)

    return restored["model"], restored.get("opt_state"), counters


def checkpoint_exists(path):
    return os.path.isdir(path) and len(os.listdir(path)) > 0
