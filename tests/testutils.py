"""Shared test fixtures (mirrors ref: tests/testutils.py:20-133).

``get_default_parameters`` returns a minimal config; ``init_dataset`` writes
synthetic yearly HDF5 files plus all normalization stats npys into a tmpdir.
"""

import os

import numpy as np
import h5py

from makani_tpu.utils import ParamsBase


def get_default_parameters():
    params = ParamsBase()

    params.update_params({
        # dataset / shapes
        "dhours": 24,
        "h5_path": "fields",
        "n_history": 0,
        "n_future": 0,
        "normalization": "zscore",
        "data_grid_type": "equiangular",
        "model_grid_type": "equiangular",
        "sht_grid_type": "legendre-gauss",
        # in/out channels
        "in_channels": [0, 1, 2, 3],
        "out_channels": [0, 1, 2, 3],
        "channel_names": ["u10m", "v10m", "t2m", "z500"],
        # grid sizes
        "img_shape_x": 36,
        "img_shape_y": 72,
        # aux features
        "add_grid": False,
        "gridtype": "linear",
        "grid_num_frequencies": 1,
        "add_zenith": False,
        "add_orography": False,
        "add_landmask": False,
        "target": "default",
        "batch_size": 2,
        "valid_autoreg_steps": 0,
        "num_data_workers": 1,
        "enable_synthetic_data": False,
        "amp_mode": "none",
        "enable_benchy": False,
        "crop_size_x": None,
        "crop_size_y": None,
        "io_grid": [1, 1, 1],
        "io_rank": [0, 0, 0],
        "roll": False,
        "add_noise": False,
        "noise_std": 0.0,
        "history_normalization_mode": "none",
        # optimization
        "loss": "geometric l2",
        "channel_weights": "constant",
        "lr": 1e-4,
        "weight_decay": 0.0,
        "optimizer_type": "AdamW",
        "optimizer_beta1": 0.9,
        "optimizer_beta2": 0.95,
        "optimizer_max_grad_norm": 1.0,
        "scheduler": "none",
        "lr_warmup_steps": 0,
        "max_epochs": 1,
        "dt": 1,
        # misc
        "enable_nhwc": False,
        "log_to_screen": False,
        "log_to_wandb": False,
        "log_video": 0,
        "save_checkpoint": "none",
        "load_checkpoint": "none",
    })

    return params


def init_dataset(path, params, n_samples_per_year=20, n_years=2, start_year=2017, seed=333):
    """Write synthetic random yearly H5 files + stats npys
    (ref: tests/testutils.py:75-133)."""
    rng = np.random.RandomState(seed)

    n_channels = len(params.in_channels)
    img_shape = (params.img_shape_x, params.img_shape_y)

    train_dir = os.path.join(path, "train")
    valid_dir = os.path.join(path, "test")
    stats_dir = os.path.join(path, "stats")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(valid_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)

    for i, d in enumerate([train_dir, valid_dir]):
        for y in range(n_years):
            year = start_year + i * n_years + y
            fname = os.path.join(d, f"{year}.h5")
            if os.path.exists(fname):
                continue  # idempotent: keep files another dataset may hold open
            data = rng.randn(n_samples_per_year, n_channels, *img_shape).astype(np.float32)
            with h5py.File(fname, "w") as f:
                f.create_dataset(params.h5_path, data=data)

    np.save(os.path.join(stats_dir, "global_means.npy"), np.zeros((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "global_stds.npy"), np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "mins.npy"), -4 * np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "maxs.npy"), 4 * np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "time_means.npy"), np.zeros((1, n_channels, *img_shape), np.float32))
    np.save(os.path.join(stats_dir, "time_diff_means.npy"), np.zeros((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "time_diff_stds.npy"), np.ones((1, n_channels, 1, 1), np.float32))

    return set_dataset_paths(path, params)


def set_dataset_paths(path, params):
    """Point params at a dataset dir previously written by init_dataset
    (read-only: lets subprocess ranks share one dataset without re-writing)."""
    stats_dir = os.path.join(path, "stats")
    params.train_data_path = os.path.join(path, "train")
    params.valid_data_path = os.path.join(path, "test")
    params.inf_data_path = params.valid_data_path
    params.min_path = os.path.join(stats_dir, "mins.npy")
    params.max_path = os.path.join(stats_dir, "maxs.npy")
    params.time_means_path = os.path.join(stats_dir, "time_means.npy")
    params.global_means_path = os.path.join(stats_dir, "global_means.npy")
    params.global_stds_path = os.path.join(stats_dir, "global_stds.npy")
    params.time_diff_means_path = os.path.join(stats_dir, "time_diff_means.npy")
    params.time_diff_stds_path = os.path.join(stats_dir, "time_diff_stds.npy")

    return params
