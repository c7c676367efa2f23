"""Multi-process (multi-host) training parity.

The gate on every pod claim: a 2-process CPU cluster (1 device each, data
parallel over DCN-analog) must produce the SAME train/validation losses as a
single process owning both devices. Exercises jax.distributed bootstrap,
per-process loader sharding, and the make_array_from_process_local_data
device boundary in Trainer._device_batch (ref semantics:
makani/utils/dataloader.py:27-60 + trainer.py:712-797).

Runs in subprocesses because process count is fixed at backend init.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_driver.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the parent pytest process pins XLA_FLAGS/JAX_PLATFORMS via conftest;
    # the driver sets its own
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_single(out, timeout=600, extra=()):
    subprocess.run(
        [sys.executable, DRIVER, "--num-processes", "1",
         "--devices-per-process", "2", "--out", out, *extra],
        env=_clean_env(), timeout=timeout, check=True)


def _run_pair(out, timeout=600, extra=()):
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, "--num-processes", "2",
             "--process-id", str(i), "--devices-per-process", "1",
             "--port", str(port), "--out", out, *extra],
            env=env)
        for i in range(2)
    ]
    try:
        for p in procs:
            assert p.wait(timeout=timeout) == 0, "multi-process rank failed"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


@pytest.mark.parametrize("dummy", [0])  # single case; parametrize hook for future layouts
def test_two_process_training_matches_single(tmp_path, dummy):
    out1 = str(tmp_path / "single.json")
    out2 = str(tmp_path / "pair.json")

    _run_single(out1)
    _run_pair(out2)

    with open(out1) as f:
        r1 = json.load(f)
    with open(out2) as f:
        r2 = json.load(f)

    assert r1["iters"] == r2["iters"] > 0
    # identical global batches (index-seeded synthetic data + strided shard
    # interleaving reconstructs the same global batch rows) => same losses
    np.testing.assert_allclose(r2["train_loss"], r1["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(r2["valid_loss"], r1["valid_loss"], rtol=1e-5)


def test_two_process_spatial_mp_io_matches_single(tmp_path):
    """Spatial model parallelism spanning PROCESSES with file-backed data
    (VERDICT r2 #3): h=2 over two 1-device processes activates the
    io-sharded subwindow reads (data/dataloader.py init_distributed_io),
    the per-process patch assembly in Trainer._device_batch, and the
    MultifilesDataset crop reads. Losses must match the same [2,1,1,1]
    layout run by ONE process owning both devices, where every process
    reads the full field (ref: makani/utils/dataloader.py:27-60,
    dali_es_helper_2d.py:276-285)."""
    from testutils import get_default_parameters, init_dataset

    # write the shared dataset once in the parent
    params = get_default_parameters()
    params.update_params({"img_shape_x": 16, "img_shape_y": 32})
    data_dir = str(tmp_path / "data")
    init_dataset(data_dir, params, n_samples_per_year=10, n_years=1)

    extra = ("--model-parallel-sizes", "2,1,1,1", "--data-dir", data_dir)
    out1 = str(tmp_path / "single.json")
    out2 = str(tmp_path / "pair.json")
    _run_single(out1, extra=extra)
    _run_pair(out2, extra=extra)

    with open(out1) as f:
        r1 = json.load(f)
    with open(out2) as f:
        r2 = json.load(f)

    assert r1["iters"] == r2["iters"] > 0
    assert r2["io_grid"] == [1, 2, 1]  # the sharded-read path actually ran
    assert r1["io_grid"] == [1, 1, 1]  # single process reads full fields
    np.testing.assert_allclose(r2["train_loss"], r1["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(r2["valid_loss"], r1["valid_loss"], rtol=1e-5)
