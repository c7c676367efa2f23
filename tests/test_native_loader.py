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
