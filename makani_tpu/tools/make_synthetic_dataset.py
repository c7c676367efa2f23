"""Generate a synthetic ERA5-like dataset (yearly H5s + stats + data.json).

Used by smoke tests, CLI verification drives and benchmarks. Mirrors the
reference test fixture semantics (ref: tests/testutils.py:75-133) with a
proper dataset descriptor (ref: datasets/era5/data.json).
"""

import argparse
import json
import os

import numpy as np
import h5py

DEFAULT_CHANNELS = ["u10m", "v10m", "t2m", "z500"]


def make_dataset(path, img_shape=(36, 72), channels=DEFAULT_CHANNELS,
                 n_samples_per_year=24, n_years=1, start_year=2018, dhours=6, seed=333):
    rng = np.random.RandomState(seed)
    n_channels = len(channels)

    train_dir = os.path.join(path, "train")
    valid_dir = os.path.join(path, "test")
    stats_dir = os.path.join(path, "stats")
    for d in (train_dir, valid_dir, stats_dir):
        os.makedirs(d, exist_ok=True)

    for i, d in enumerate([train_dir, valid_dir]):
        for y in range(n_years):
            year = start_year + i * n_years + y
            fname = os.path.join(d, f"{year}.h5")
            data = rng.randn(n_samples_per_year, n_channels, *img_shape).astype(np.float32)
            with h5py.File(fname, "w") as f:
                f.create_dataset("fields", data=data)

    np.save(os.path.join(stats_dir, "global_means.npy"), np.zeros((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "global_stds.npy"), np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "mins.npy"), -4 * np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "maxs.npy"), 4 * np.ones((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "time_means.npy"), np.zeros((1, n_channels, *img_shape), np.float32))
    np.save(os.path.join(stats_dir, "time_diff_means.npy"), np.zeros((1, n_channels, 1, 1), np.float32))
    np.save(os.path.join(stats_dir, "time_diff_stds.npy"), np.ones((1, n_channels, 1, 1), np.float32))

    lat = np.linspace(90, -90, img_shape[0]).tolist()
    lon = np.arange(0, 360, 360.0 / img_shape[1]).tolist()
    metadata = {
        "dataset_name": "synthetic",
        "attrs": {"description": "synthetic random dataset for smoke tests"},
        "h5_path": "fields",
        "dims": ["time", "channel", "lat", "lon"],
        "dhours": dhours,
        "coords": {
            "grid_type": "equiangular",
            "lat": lat,
            "lon": lon,
            "channel": list(channels),
        },
    }
    with open(os.path.join(path, "data.json"), "w") as f:
        json.dump(metadata, f)

    return path


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="./datasets/synthetic", type=str)
    parser.add_argument("--nlat", default=36, type=int)
    parser.add_argument("--nlon", default=72, type=int)
    parser.add_argument("--samples", default=24, type=int)
    parser.add_argument("--years", default=1, type=int)
    parser.add_argument("--channels", default=",".join(DEFAULT_CHANNELS), type=str)
    args = parser.parse_args()
    make_dataset(args.output, img_shape=(args.nlat, args.nlon),
                 channels=args.channels.split(","),
                 n_samples_per_year=args.samples, n_years=args.years)
    print(f"wrote synthetic dataset to {args.output}")
