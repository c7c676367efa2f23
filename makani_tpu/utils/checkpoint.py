"""Checkpoint save/restore.

The reference has two formats (ref: makani/utils/trainer.py:936-1098):
"legacy" per-mp-rank full dicts and "flexible" gather-to-rank0 files that can
be restored onto any model-parallel layout. With JAX + orbax, the flexible
semantics come for free: checkpoints store the *global* logical arrays and
restore re-shards onto whatever mesh/sharding the restore target uses
(cross-mesh restore is covered by tests/test_checkpoint_manager.py).

Two layouts:
- single-dir (the "best" checkpoint + model packages):
  <path>/model, <path>/opt_state, <path>/counters.json
- versioned (per-epoch training checkpoints): an orbax CheckpointManager
  root with numbered step dirs <path>/<epoch>/{model,opt_state,counters},
  async writes (training continues while the previous epoch persists) and
  keep-N retention (ref behavior: per-epoch ckpt + resume mid-training,
  trainer.py:666-673).

restore_checkpoint()/checkpoint_exists() accept either layout (versioned
roots resolve to their latest step), so inference CLIs can point at either.
"""

import json
import os
import re
from typing import Optional

import orbax.checkpoint as ocp


def _counters_path(path):
    return os.path.join(path, "counters.json")


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves():
    """Block until all in-flight async single-dir saves are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path, params, opt_state=None, counters: Optional[dict] = None,
                    background=True):
    """Save a single-dir checkpoint (model params + optimizer state +
    counters). With background=True the array writes are asynchronous
    (orbax writes to a tmp dir and atomically renames, so a crash mid-save
    never corrupts the previous checkpoint)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = _async_checkpointer()
    ckptr.save(os.path.join(path, "model"), params, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if counters is not None:
        with open(_counters_path(path), "w") as f:
            json.dump(counters, f)
    if not background:
        ckptr.wait_until_finished()


def _resolve(path):
    """Resolve a checkpoint path: single-dir layouts pass through, versioned
    manager roots resolve to their latest step dir."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "model")):
        return path
    steps = []
    if os.path.isdir(path):
        for name in os.listdir(path):
            if re.fullmatch(r"\d+", name) and \
                    os.path.isdir(os.path.join(path, name, "model")):
                steps.append(int(name))
    if steps:
        return os.path.join(path, str(max(steps)))
    return path


def restore_checkpoint(path, params_template, opt_state_template=None):
    """Restore onto the given templates (shape/dtype/sharding donors) —
    templates may live on a DIFFERENT mesh/sharding than the save used
    (the reference's flexible-restore re-split, ref: trainer.py:1056-1098).
    Returns (params, opt_state_or_None, counters_dict)."""
    wait_for_saves()
    path = _resolve(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        params = ckptr.restore(os.path.join(path, "model"), target=params_template)
    except (ValueError, KeyError) as e:
        raise RuntimeError(
            f"checkpoint param-tree mismatch restoring {path}: {e}\n"
            "Known param-tree breaks: AFNO v2's normalization='layer_norm' "
            "variant gained (H, W) affine weight/bias leaves (LayerNormHW) — "
            "checkpoints of that variant saved before the change cannot be "
            "restored; re-save or pad the missing leaves. "
            "tools/convert_torch_checkpoint.py maps SFNO trees only."
        ) from e

    opt_state = None
    opt_path = os.path.join(path, "opt_state")
    if opt_state_template is not None and os.path.isdir(opt_path):
        opt_state = ckptr.restore(opt_path, target=opt_state_template)

    counters = {}
    # single-dir layout keeps counters inside the dir; versioned steps park
    # them under the manager root as counters-<step>.json
    candidates = [_counters_path(path)]
    root, leaf = os.path.split(path)
    if re.fullmatch(r"\d+", leaf or ""):
        candidates.append(os.path.join(root, f"counters-{leaf}.json"))
    for cpath in candidates:
        if os.path.exists(cpath):
            with open(cpath) as f:
                counters = json.load(f)
            break

    return params, opt_state, counters


def checkpoint_exists(path):
    return os.path.isdir(os.path.join(_resolve(path), "model"))


class TrainingCheckpointer:
    """Versioned per-epoch checkpoints: async orbax CheckpointManager with
    keep-N retention. Step dirs use the single-dir layout so
    restore_checkpoint() can read them directly."""

    def __init__(self, directory, max_to_keep=3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                step_prefix=None,
                enable_async_checkpointing=True,
                create=True,
            ),
        )

    def save(self, step: int, params, opt_state=None, counters: Optional[dict] = None):
        args = {"model": ocp.args.StandardSave(params)}
        if opt_state is not None:
            args["opt_state"] = ocp.args.StandardSave(opt_state)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        if counters is not None:
            # counters are tiny; write synchronously next to the step dir
            # (orbax finalizes the dir asynchronously — park them under the
            # root keyed by step and move on)
            with open(os.path.join(self.directory, f"counters-{step}.json"), "w") as f:
                json.dump(counters, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, params_template, opt_state_template=None, step=None):
        """Returns (params, opt_state_or_None, counters)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        args = {"model": ocp.args.StandardRestore(params_template)}
        if opt_state_template is not None:
            args["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        out = self._mgr.restore(step, args=ocp.args.Composite(**args))
        counters = {}
        cpath = os.path.join(self.directory, f"counters-{step}.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                counters = json.load(f)
        return out["model"], out.get("opt_state"), counters

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
