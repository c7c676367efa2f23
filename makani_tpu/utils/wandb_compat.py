"""wandb-compatible experiment logger.

The reference logs epochs/metrics/rollout tables to Weights & Biases
(ref: makani/utils/trainer.py:328-373,927-932). The wandb client is not
available in every deployment, so this module provides the same call surface
(init/log/Table/finish, run-id resume semantics) backed by JSON-lines files
in the experiment dir; when the real wandb package is importable it is used
transparently.
"""

import json
import os
import time
import uuid

try:
    import wandb as _real_wandb
except ImportError:
    _real_wandb = None


class Table:
    def __init__(self, data=None, columns=None):
        self.data = data or []
        self.columns = columns or []

    def to_json(self):
        return {"_type": "table", "columns": self.columns, "data": self.data}


class _Run:
    def __init__(self, dir, name, id):
        self.dir = dir
        self.name = name
        self.id = id


class Artifact:
    """File/dir artifact records (the wandb.Artifact surface). The file
    backend copies contents into <run dir>/artifacts/<name>/ at log time."""

    def __init__(self, name, type="dataset", description=None, metadata=None):
        self.name = name
        self.type = type
        self.description = description
        self.metadata = metadata or {}
        self._entries = []

    def add_file(self, local_path, name=None):
        self._entries.append(("file", local_path, name or os.path.basename(local_path)))

    def add_dir(self, local_path, name=None):
        self._entries.append(("dir", local_path, name or os.path.basename(local_path)))


def tree_histograms(tree, bins=64, prefix=""):
    """Per-leaf summary stats + histogram for a pytree of arrays — the
    functional stand-in for wandb.watch's module hooks (our models are
    functional; there is no module object to hook)."""
    import numpy as np
    try:
        import jax
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        items = [("/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path), leaf)
                 for path, leaf in leaves]
    except Exception:
        items = [("leaf", tree)]
    out = {}
    for name, leaf in items:
        a = np.asarray(leaf, dtype=np.float64).ravel()
        if a.size == 0:
            continue
        counts, edges = np.histogram(a, bins=bins)
        out[f"{prefix}{name}"] = {
            "_type": "histogram",
            "min": float(a.min()), "max": float(a.max()),
            "mean": float(a.mean()), "std": float(a.std()),
            "l2": float(np.sqrt((a * a).sum())),
            "counts": counts.tolist(),
            "edges": [float(edges[0]), float(edges[-1])],
        }
    return out


class _FileBackend:
    def __init__(self):
        self.run = None
        self._fh = None
        self._step = 0

    def init(self, dir=".", config=None, name=None, group=None, project=None,
             entity=None, resume=False, id=None, **kwargs):
        os.makedirs(dir, exist_ok=True)
        run_id_path = os.path.join(dir, "wandb_run_id.txt")
        if resume and os.path.exists(run_id_path):
            with open(run_id_path) as f:
                run_id = f.read().strip()
        else:
            run_id = id or uuid.uuid4().hex[:8]
            with open(run_id_path, "w") as f:
                f.write(run_id)

        self.run = _Run(dir, name or run_id, run_id)
        mode = "a" if resume else "w"
        self._fh = open(os.path.join(dir, "wandb_log.jsonl"), mode)
        header = {"event": "init", "time": time.time(), "name": name,
                  "group": group, "project": project, "run_id": run_id}
        if config is not None:
            try:
                header["config"] = {k: str(v) for k, v in dict(config.to_dict() if hasattr(config, "to_dict") else config).items()}
            except Exception:
                pass
        self._fh.write(json.dumps(header) + "\n")
        self._fh.flush()
        return self.run

    def log(self, data, step=None, **kwargs):
        if self._fh is None:
            return
        payload = {}
        for k, v in data.items():
            if isinstance(v, Table):
                payload[k] = v.to_json()
            elif hasattr(v, "item"):
                payload[k] = float(v)
            else:
                try:
                    json.dumps(v)
                    payload[k] = v
                except TypeError:
                    payload[k] = str(v)
        self._fh.write(json.dumps({"event": "log", "step": step if step is not None else self._step,
                                   "time": time.time(), "data": payload}) + "\n")
        self._fh.flush()
        self._step += 1

    def watch(self, tree=None, log="gradients", log_freq=100, **kwargs):
        """Functional watch: immediately logs parameter histograms for the
        given pytree (call again periodically — there are no module hooks
        to install on a functional model)."""
        if log == "gradients" or ("log_freq" in kwargs or log_freq != 100):
            import logging
            logging.getLogger(__name__).warning(
                "wandb fallback watch(): periodic %r tracking (log_freq=%s) is "
                "not supported without module hooks; logging a one-shot "
                "parameter-histogram snapshot instead — re-call watch() on "
                "your own cadence for periodic snapshots", log, log_freq)
        if tree is not None:
            self.log({"watch": tree_histograms(tree, prefix="param/")})

    def log_artifact(self, artifact, **kwargs):
        import shutil
        if self.run is None or not isinstance(artifact, Artifact):
            return
        dest = os.path.join(self.run.dir, "artifacts", artifact.name)
        os.makedirs(dest, exist_ok=True)
        manifest = []
        for kind, src, name in artifact._entries:
            target = os.path.join(dest, name)
            try:
                if kind == "dir":
                    shutil.copytree(src, target, dirs_exist_ok=True)
                else:
                    shutil.copy2(src, target)
                manifest.append(name)
            except OSError:
                pass
        self.log({"artifact": {"_type": "artifact", "name": artifact.name,
                               "artifact_type": artifact.type,
                               "metadata": artifact.metadata,
                               "files": manifest}})

    def login(self, *args, **kwargs):
        pass

    def finish(self):
        if self._fh is not None:
            self._fh.write(json.dumps({"event": "finish", "time": time.time()}) + "\n")
            self._fh.close()
            self._fh = None


if _real_wandb is not None:
    init = _real_wandb.init
    log = _real_wandb.log
    watch = _real_wandb.watch
    login = _real_wandb.login
    finish = _real_wandb.finish
    log_artifact = _real_wandb.log_artifact
    Table = _real_wandb.Table  # noqa: F811
    Artifact = _real_wandb.Artifact  # noqa: F811
else:
    _backend = _FileBackend()
    init = _backend.init
    log = _backend.log
    watch = _backend.watch
    login = _backend.login
    finish = _backend.finish
    log_artifact = _backend.log_artifact
