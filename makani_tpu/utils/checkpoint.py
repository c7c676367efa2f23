"""Checkpoint save/restore.

The reference has two formats (ref: makani/utils/trainer.py:936-1098):
"legacy" per-mp-rank full dicts and "flexible" gather-to-rank0 files that can
be restored onto any model-parallel layout. With JAX + orbax, the flexible
semantics come for free: checkpoints store the *global* logical arrays and
restore re-shards onto whatever mesh/sharding the restore target uses.

Layout: <path>/model, <path>/opt_state (separate orbax items so inference can
restore the model without an optimizer template), <path>/counters.json.
"""

import json
import os
from typing import Optional

import orbax.checkpoint as ocp


def _counters_path(path):
    return os.path.join(path, "counters.json")


def _save_item(path, item):
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, item)
    ckptr.wait_until_finished()


def save_checkpoint(path, params, opt_state=None, counters: Optional[dict] = None):
    """Save a training checkpoint (model params + optimizer state + counters)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    _save_item(os.path.join(path, "model"), params)
    if opt_state is not None:
        _save_item(os.path.join(path, "opt_state"), opt_state)
    if counters is not None:
        with open(_counters_path(path), "w") as f:
            json.dump(counters, f)


def restore_checkpoint(path, params_template, opt_state_template=None):
    """Restore onto the given templates (shape/dtype/sharding donors).
    Returns (params, opt_state_or_None, counters_dict)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "model"), target=params_template)

    opt_state = None
    opt_path = os.path.join(path, "opt_state")
    if opt_state_template is not None and os.path.isdir(opt_path):
        opt_state = ckptr.restore(opt_path, target=opt_state_template)

    counters = {}
    cpath = _counters_path(path)
    if os.path.exists(cpath):
        with open(cpath) as f:
            counters = json.load(f)

    return params, opt_state, counters


def checkpoint_exists(path):
    return os.path.isdir(os.path.join(path, "model"))
