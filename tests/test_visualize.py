"""Visualization + wandb-fallback observability surface.

Covers the reference capabilities: comparison pngs, rollout videos
(ref: makani/utils/visualize.py), wandb watch/artifacts
(ref: makani/utils/trainer.py:328-373).
"""

import json
import os
import struct

import numpy as np
import pytest


def _frames(t=4, h=24, w=48):
    rng = np.random.RandomState(0)
    return (rng.rand(t, h, w, 3) * 255).astype(np.uint8)


def test_mjpeg_avi_writer(tmp_path):
    from makani_tpu.utils.visualize import write_mjpeg_avi

    out = str(tmp_path / "movie.avi")
    write_mjpeg_avi(_frames(), out, fps=4)
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF"
    assert data[8:12] == b"AVI "
    # RIFF size field consistent with the file length
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data
    # 4 frame chunks
    assert data.count(b"00dc") >= 8  # movi chunks + idx1 entries


def test_gif_writer_roundtrip(tmp_path):
    from PIL import Image
    from makani_tpu.utils.visualize import write_gif

    out = str(tmp_path / "movie.gif")
    write_gif(_frames(), out, fps=4)
    img = Image.open(out)
    assert getattr(img, "n_frames", 1) == 4


def test_render_rollout_video(tmp_path):
    from makani_tpu.utils.visualize import render_rollout_video

    rng = np.random.RandomState(1)
    pred = rng.randn(3, 20, 40).astype(np.float32)
    targ = rng.randn(3, 20, 40).astype(np.float32)
    out = render_rollout_video(pred, targ, str(tmp_path / "roll.avi"), fps=2)
    assert os.path.getsize(out) > 100
    out_gif = render_rollout_video(pred, targ, str(tmp_path / "roll.gif"), fps=2)
    assert os.path.getsize(out_gif) > 100


def test_visualization_wrapper_video(tmp_path):
    from makani_tpu.utils.visualize import VisualizationWrapper

    class P:
        experiment_dir = str(tmp_path)

    viz = VisualizationWrapper(P(), num_workers=1)
    rng = np.random.RandomState(2)
    viz.add_video("rollout", rng.randn(3, 16, 32), rng.randn(3, 16, 32))
    paths = viz.finalize()
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_wandb_artifact_and_watch(tmp_path):
    from makani_tpu.utils import wandb_compat as wandb
    if getattr(wandb, "_real_wandb", None) is not None:
        pytest.skip("real wandb present; fallback surface not active")

    run = wandb.init(dir=str(tmp_path), name="t", config={"a": 1})
    # watch: histogram logging for a param pytree
    tree = {"dense": {"kernel": np.arange(12.0).reshape(3, 4)}}
    wandb.watch(tree)

    src = tmp_path / "model.bin"
    src.write_bytes(b"weights")
    art = wandb.Artifact("best-model", type="model", metadata={"epoch": 3})
    art.add_file(str(src))
    wandb.log_artifact(art)
    wandb.finish()

    copied = tmp_path / "artifacts" / "best-model" / "model.bin"
    assert copied.read_bytes() == b"weights"

    events = [json.loads(l) for l in open(tmp_path / "wandb_log.jsonl")]
    kinds = [e["event"] for e in events]
    assert kinds[0] == "init" and kinds[-1] == "finish"
    watch_ev = [e for e in events if e["event"] == "log" and "watch" in e.get("data", {})]
    assert watch_ev, "watch histograms not logged"
    hist = list(watch_ev[0]["data"]["watch"].values())[0]
    assert hist["_type"] == "histogram" and sum(hist["counts"]) == 12
    art_ev = [e for e in events if e["event"] == "log" and "artifact" in e.get("data", {})]
    assert art_ev and art_ev[0]["data"]["artifact"]["files"] == ["model.bin"]


def test_tree_histograms_paths():
    from makani_tpu.utils.wandb_compat import tree_histograms

    tree = {"block": {"w": np.ones((2, 2)), "b": np.zeros(3)}}
    h = tree_histograms(tree, prefix="param/")
    assert any(k.endswith("w") for k in h) and any(k.endswith("b") for k in h)
    wkey = [k for k in h if k.endswith("w")][0]
    assert h[wkey]["mean"] == 1.0
