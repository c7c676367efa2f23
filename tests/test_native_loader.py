"""Native (C++) raw-shard loader: reader correctness + dataset parity with
the HDF5 multifiles dataset."""

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


def test_binary_dataset_matches_h5(tmp_path):
    from makani_tpu.data.dataset import MultifilesDataset
    from makani_tpu.data.native_loader import BinaryDataset, convert_h5_to_bin

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=10, n_years=2)
    params["add_zenith"] = True

    bin_dir = str(tmp_path / "train_bin")
    convert_h5_to_bin(params.train_data_path, bin_dir)

    ds_h5 = MultifilesDataset(params, params.train_data_path, train=True)
    ds_bin = BinaryDataset(params, bin_dir, train=True)

    assert len(ds_h5) == len(ds_bin)

    for idx in [0, 5, len(ds_h5) - 1]:
        h5_out = ds_h5[idx]
        bin_out = ds_bin[idx]
        assert len(h5_out) == len(bin_out) == 4
        for a, b in zip(h5_out, bin_out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)


def test_native_loader_in_dataloader(tmp_path):
    from makani_tpu.data import get_dataloader
    from makani_tpu.data.native_loader import convert_h5_to_bin

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=10, n_years=1)
    bin_dir = str(tmp_path / "bin")
    convert_h5_to_bin(params.train_data_path, bin_dir)

    params["n_train_samples_per_epoch"] = 4
    loader, dataset = get_dataloader(params, bin_dir, train=True)
    from makani_tpu.data.native_loader import BinaryDataset
    assert isinstance(dataset, BinaryDataset)

    batches = list(loader)
    assert len(batches) == 2
    inp, tar = batches[0][:2]
    assert inp.shape == (2, 1, 4, 36, 72)
    assert np.isfinite(inp).all()


def test_samples_offset(tmp_path):
    """samples_offset selects later initial conditions (fork capability,
    ref: dali_es_helper_2d.py:303-307)."""
    from makani_tpu.data import get_dataloader

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=12, n_years=1)
    params["n_eval_samples"] = 2
    params["batch_size"] = 1
    params["valid_autoreg_steps"] = 0

    loader0, ds = get_dataloader(params, params.valid_data_path, train=False)
    params["samples_offset"] = 3
    loader3, _ = get_dataloader(params, params.valid_data_path, train=False)

    b0 = next(iter(loader0))
    b3 = next(iter(loader3))
    # offset loader's first sample equals the base dataset's sample at index 3
    np.testing.assert_allclose(b3[0][0], ds[3][0], rtol=1e-6)
    assert not np.allclose(b0[0][0], b3[0][0])


def test_binary_dataset_windowed_channel_subset_matches_h5(tmp_path):
    """Crop + io-sharded spatial window + distinct in/out channel subsets +
    per-channel stats + history: the native subwindow read path must match
    the HDF5 dataset exactly (VERDICT r1 item 7: out-stats aliasing, missing
    crop, and missing io-sharded reads in BinaryDataset)."""
    from makani_tpu.data.dataset import MultifilesDataset
    from makani_tpu.data.native_loader import BinaryDataset, convert_h5_to_bin

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=12, n_years=1)
    # distinct per-channel stats so in/out normalization aliasing is caught
    n_chan = len(params.in_channels)
    rng = np.random.RandomState(11)
    np.save(params.global_means_path,
            rng.randn(1, n_chan, 1, 1).astype(np.float32))
    np.save(params.global_stds_path,
            (1.0 + rng.rand(1, n_chan, 1, 1)).astype(np.float32))
    params.update_params({
        "in_channels": [0, 2, 3],
        "out_channels": [1, 3],
        "n_history": 1,
        "add_zenith": True,
        "crop_size_x": 30, "crop_size_y": 64,
        "crop_anchor_x": 2, "crop_anchor_y": 4,
        "io_grid": [1, 2, 2], "io_rank": [0, 1, 1],
    })

    bin_dir = str(tmp_path / "train_bin_win")
    convert_h5_to_bin(params.train_data_path, bin_dir)

    ds_h5 = MultifilesDataset(params, params.train_data_path, train=True)
    ds_bin = BinaryDataset(params, bin_dir, train=True)

    assert ds_bin.img_local_shape_x == ds_h5.img_local_shape_x
    assert ds_bin.img_local_shape_y == ds_h5.img_local_shape_y
    assert ds_bin.img_local_offset_x == ds_h5.img_local_offset_x
    np.testing.assert_allclose(ds_bin.out_bias, ds_h5.out_bias)
    np.testing.assert_allclose(ds_bin.out_scale, ds_h5.out_scale)

    for idx in [0, 4, len(ds_h5) - 1]:
        h5_out = ds_h5[idx]
        bin_out = ds_bin[idx]
        assert len(h5_out) == len(bin_out) == 4
        for i, (a, b) in enumerate(zip(h5_out, bin_out)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6,
                err_msg=f"sample {idx} field {i}")


def test_odirect_reads_match_buffered(tmp_path):
    """enable_odirect: direct reads (aligned bounce-buffer path in csrc)
    must return byte-identical data to buffered reads across all three C
    read entry points. On filesystems that reject O_DIRECT the loader falls
    back per-file and reports it via odirect_active (ref O_DIRECT handling:
    dali_es_helper_2d.py:103-106)."""
    from makani_tpu.data.native_loader import (
        NativeReader, convert_h5_to_bin)

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=10, n_years=2)
    bin_dir = str(tmp_path / "bin")
    paths = convert_h5_to_bin(params.train_data_path, bin_dir)

    buffered = NativeReader(paths, n_threads=2, use_odirect=False)
    direct = NativeReader(paths, n_threads=2, use_odirect=True)
    assert not buffered.odirect_active
    # on ext4 this is True; tmpfs etc. fall back (both paths still compared)
    print(f"odirect active: {direct.odirect_active}")

    # batch reads (unaligned offsets: npy header shifts every sample)
    fi = [0, 1, 0, 1]
    si = [0, 3, 9, 7]
    np.testing.assert_array_equal(direct.read_batch(fi, si),
                                  buffered.read_batch(fi, si))

    # window reads
    np.testing.assert_array_equal(direct.read_window(1, 2, 4),
                                  buffered.read_window(1, 2, 4))

    # io-sharded subwindow reads (strided rows + fused normalization)
    H, W = buffered.sample_shape[-2:]
    chans = [0, 2]
    bias = np.array([0.5, -1.0], np.float32)
    scale = np.array([2.0, 0.5], np.float32)
    a = direct.read_subwindow(0, 1, 3, chans, H // 3, H // 2, W // 4, W // 2,
                              bias=bias, inv_scale=scale)
    b = buffered.read_subwindow(0, 1, 3, chans, H // 3, H // 2, W // 4, W // 2,
                                bias=bias, inv_scale=scale)
    np.testing.assert_array_equal(a, b)


def test_odirect_dataset_end_to_end(tmp_path):
    """BinaryDataset with enable_odirect=True produces samples identical to
    the buffered dataset (the full --enable_odirect plumbing, train.py flag
    -> params -> BinaryDataset -> csrc)."""
    from makani_tpu.data.native_loader import BinaryDataset, convert_h5_to_bin

    params = get_default_parameters()
    params = init_dataset(str(tmp_path), params, n_samples_per_year=10, n_years=1)
    bin_dir = str(tmp_path / "bin")
    convert_h5_to_bin(params.train_data_path, bin_dir)

    ds_buf = BinaryDataset(params, bin_dir, train=True)
    params["enable_odirect"] = True
    ds_dir = BinaryDataset(params, bin_dir, train=True)

    for idx in [0, 4, len(ds_buf) - 1]:
        for a, b in zip(ds_buf[idx], ds_dir[idx]):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
