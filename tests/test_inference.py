"""Inference engine tests: score/lite/epoch modes + NetCDF export."""

import os

import numpy as np
import pytest

from testutils import get_default_parameters, init_dataset


@pytest.fixture(autouse=True)
def serial_mesh():
    import jax
    from makani_tpu.parallel import comm
    comm.reset()
    comm.init(devices=jax.devices()[:1])
    yield
    comm.reset()


def _params(tmp_path):
    params = get_default_parameters()
    params.nettype = "SFNO"
    params.update_params({
        "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
        "hard_thresholding_fraction": 1.0, "use_mlp": True, "mlp_ratio": 2.0,
        "activation_function": "gelu", "pos_embed": "none",
        "operator_type": "dhconv", "filter_type": "linear",
        "normalization_layer": "instance_norm",
        "loss": "geometric l2", "lr": 1e-4, "batch_size": 1,
        "max_epochs": 1, "n_train_samples_per_epoch": 2, "n_eval_samples": 2,
        "valid_autoreg_steps": 2, "scheduler": "none",
        "optimizer_type": "Adam", "save_checkpoint": "flexible",
        "print_timings_frequency": -1,
    })
    params = init_dataset(str(tmp_path), params, n_samples_per_year=12, n_years=1)
    params["experiment_dir"] = str(tmp_path / "exp")
    os.makedirs(params["experiment_dir"], exist_ok=True)
    params["checkpoint_path"] = str(tmp_path / "exp" / "ckpt")
    params["best_checkpoint_path"] = str(tmp_path / "exp" / "best_ckpt")
    return params


@pytest.fixture
def trained(tmp_path):
    from makani_tpu.utils.trainer import Trainer
    params = _params(tmp_path)
    trainer = Trainer(params, world_rank=0)
    trainer.train()
    return params


def test_inference_single_and_epoch(trained, tmp_path):
    from makani_tpu.utils.inferencer import Inferencer

    params = trained
    inferencer = Inferencer(params, world_rank=0)

    # single IC with metrics + data capture
    targ, pred = inferencer.inference_single(ic=0, compute_metrics=True,
                                             output_data=True, output_channels=[0, 1])
    S = params.valid_autoreg_steps + 1
    assert pred.shape[0] == S and pred.shape[2] == 2
    assert np.isfinite(pred).all()
    assert np.isfinite(inferencer.metrics.logs["base"]["validation loss"])

    # full-epoch scoring with curve exports
    logs = inferencer.score_model(output_channels=params.out_channels)
    for fname in ["acc_curves.npy", "rmse_curves.npy", "RMSE_over_time.npy", "RMSE_over_space.npy"]:
        path = os.path.join(params.experiment_dir, fname)
        assert os.path.exists(path), fname
        assert np.isfinite(np.load(path)).all(), fname
    acc = np.load(os.path.join(params.experiment_dir, "acc_curves.npy"))
    assert acc.shape == (len(params.out_channels), S)


def test_inference_lite_with_persistence(trained):
    from makani_tpu.utils.inferencer import Inferencer

    params = trained
    params["sst_persistence_channels"] = [1]
    inferencer = Inferencer(params, world_rank=0)
    (pred,) = inferencer.inference_lite(ic=0, output_data=True, output_channels=[0, 1])
    S = params.valid_autoreg_steps + 1
    assert pred.shape[0] == S
    # persistence: channel 1 identical across all rollout steps
    for s in range(1, S):
        np.testing.assert_allclose(pred[s, :, 1], pred[0, :, 1], atol=1e-6)


def test_netcdf_roundtrip(tmp_path):
    from makani_tpu.utils.nctools import write_prediction_file, read_netcdf_var

    data = np.random.RandomState(0).randn(3, 2, 8, 16).astype(np.float32)
    path = str(tmp_path / "pred.nc")
    write_prediction_file(path, data)
    v0 = read_netcdf_var(path, "var0")
    np.testing.assert_allclose(v0, data[:, 0])


def test_inference_single_with_zenith_metrics_and_data(tmp_path):
    """Regression: with add_zenith, inference_single(compute_metrics=True,
    output_data=True) runs two rollouts over the same batch — the donated
    zenith input must not be reused after the first (round-2 bug: 'Array has
    been deleted')."""
    from makani_tpu.utils.trainer import Trainer
    from makani_tpu.utils.inferencer import Inferencer

    params = _params(tmp_path)
    params["add_zenith"] = True
    trainer = Trainer(params, world_rank=0)
    trainer.train()

    inferencer = Inferencer(params, world_rank=0)
    targ, pred = inferencer.inference_single(ic=0, compute_metrics=True,
                                             output_data=True, output_channels=[0])
    assert np.isfinite(pred).all() and np.isfinite(targ).all()


def test_rmse_exports_batch_invariant(trained, tmp_path):
    """RMSE_over_time/space must not scale with batch size: metrics_step sums
    squared error over the batch, so the export normalizes by SAMPLES, not
    batches (round-3 verdict defect, mirroring the metric.py fix)."""
    from makani_tpu.utils.inferencer import Inferencer

    params = trained
    results = {}
    for bs in (1, 2):
        params["batch_size"] = bs
        inferencer = Inferencer(params, world_rank=0)
        inferencer.inference_epoch(output_channels=params.out_channels)
        results[bs] = (
            np.load(os.path.join(params.experiment_dir, "RMSE_over_time.npy")),
            np.load(os.path.join(params.experiment_dir, "RMSE_over_space.npy")),
        )

    for a, b in zip(results[1], results[2]):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
