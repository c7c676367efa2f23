"""Model package save/load roundtrip (ref: makani/models/model_package.py)."""

import datetime
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


def test_model_package_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from makani_tpu.utils.trainer import Trainer
    from makani_tpu.models.model_package import load_model_package, LocalPackage

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
        "valid_autoreg_steps": 1, "scheduler": "none",
        "optimizer_type": "Adam", "save_checkpoint": "flexible",
        "add_zenith": True,
    })
    params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir / "training_checkpoints", exist_ok=True)
    params["experiment_dir"] = str(exp_dir)
    params["checkpoint_path"] = str(exp_dir / "training_checkpoints" / "ckpt")
    params["best_checkpoint_path"] = str(exp_dir / "training_checkpoints" / "best_ckpt")

    trainer = Trainer(params, world_rank=0)
    trainer.train()

    # package artifacts exist
    assert os.path.exists(exp_dir / "config.json")
    assert os.path.exists(exp_dir / "metadata.json")
    assert os.path.exists(exp_dir / "global_means.npy")
    assert os.path.exists(exp_dir / "global_stds.npy")

    # load and run single-step inference through the wrapper
    wrapper = load_model_package(LocalPackage(str(exp_dir)))
    x = jnp.asarray(np.random.RandomState(0).randn(
        1, len(params.in_channels), params.img_shape_x, params.img_shape_y).astype(np.float32))
    y = wrapper(x, datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc))
    assert y.shape == (1, len(params.out_channels), params.img_shape_x, params.img_shape_y)
    assert np.isfinite(np.asarray(y)).all()

    # wrapper params match the trained best checkpoint
    for a, b in zip(jax.tree.leaves(trainer.model_params),
                    jax.tree.leaves(wrapper.model_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_time_loop(tmp_path):
    """load_time_loop steps physical fields forward at dt-hour cadence
    (the metadata.json entrypoint; ref: model_package.py:199-268)."""
    import jax.numpy as jnp
    from makani_tpu.utils.trainer import Trainer
    from makani_tpu.models.model_package import load_time_loop

    params = get_default_parameters()
    params.nettype = "SFNO"
    params.update_params({
        "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
        "use_mlp": False, "activation_function": "gelu", "pos_embed": "none",
        "operator_type": "dhconv", "filter_type": "linear",
        "normalization_layer": "instance_norm",
        "loss": "geometric l2", "lr": 1e-4, "batch_size": 1,
        "max_epochs": 1, "n_train_samples_per_epoch": 2, "n_eval_samples": 2,
        "valid_autoreg_steps": 1, "scheduler": "none",
        "optimizer_type": "Adam", "save_checkpoint": "flexible",
        "add_zenith": True,
    })
    params = init_dataset(str(tmp_path), params, n_samples_per_year=8, n_years=1)
    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir / "training_checkpoints", exist_ok=True)
    params["experiment_dir"] = str(exp_dir)
    params["checkpoint_path"] = str(exp_dir / "training_checkpoints" / "ckpt")
    params["best_checkpoint_path"] = str(exp_dir / "training_checkpoints" / "best_ckpt")

    Trainer(params, world_rank=0).train()

    loop = load_time_loop(str(exp_dir))
    nchan = len(params.in_channels)
    x = np.random.RandomState(1).randn(
        1, 1, nchan, params.img_shape_x, params.img_shape_y).astype(np.float32)
    t0 = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)

    it = loop(x, t0)
    times, fields = [], []
    for _ in range(3):
        t, f = next(it)
        times.append(t)
        fields.append(f)

    # first yield is the IC itself in physical units
    np.testing.assert_allclose(fields[0], x[:, -1], rtol=1e-5, atol=1e-5)
    assert times[0] == t0
    assert times[1] - times[0] == loop.time_step
    for f in fields:
        assert f.shape == (1, nchan, params.img_shape_x, params.img_shape_y)
        assert np.isfinite(f).all()
    # the model must actually advance the state
    assert not np.allclose(fields[1], fields[0])
