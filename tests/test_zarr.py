"""Zarr dataset path + zenith/field time-alignment regression tests.

The zarr package is absent in this deployment, so ZarrDataset is exercised
against a minimal in-test stub exposing the only API surface the reader uses
(``zarr.open(path, mode="r")[dataset_path]`` -> ndarray-like). This pins the
window/normalization/sharding logic shared with MultifilesDataset
(ref zarr path: makani/utils/dataloaders/dali_es_helper_2d.py:219-231).
"""

import datetime
import os
import sys
import types
import unittest
import tempfile

import numpy as np
import h5py

from testutils import get_default_parameters, init_dataset
from makani_tpu.data.dataset import MultifilesDataset


def _make_zarr_stub():
    """A fake ``zarr`` module: each YYYY.zarr is a directory holding
    <dataset_path>.npy; open() returns a dict-like group."""
    stub = types.ModuleType("zarr")

    class _Group(dict):
        pass

    def open(path, mode="r"):
        group = _Group()
        for fname in os.listdir(path):
            if fname.endswith(".npy"):
                group[fname[:-4]] = np.load(os.path.join(path, fname), mmap_mode="r")
        return group

    stub.open = open
    return stub


def _h5_to_fake_zarr(h5_dir, zarr_dir, dataset_path):
    os.makedirs(zarr_dir, exist_ok=True)
    for fname in sorted(os.listdir(h5_dir)):
        if not fname.endswith(".h5"):
            continue
        with h5py.File(os.path.join(h5_dir, fname), "r") as f:
            data = f[dataset_path][...]
        store = os.path.join(zarr_dir, fname[:-3] + ".zarr")
        os.makedirs(store, exist_ok=True)
        np.save(os.path.join(store, dataset_path + ".npy"), data)


class TestZarrDataset(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.tmp = tempfile.TemporaryDirectory()
        params = get_default_parameters()
        params = init_dataset(cls.tmp.name, params, n_samples_per_year=8, n_years=2)
        cls.params = params
        cls.zarr_train = os.path.join(cls.tmp.name, "train_zarr")
        _h5_to_fake_zarr(params.train_data_path, cls.zarr_train, params.h5_path)
        sys.modules["zarr"] = _make_zarr_stub()

    @classmethod
    def tearDownClass(cls):
        sys.modules.pop("zarr", None)
        cls.tmp.cleanup()

    def test_zarr_matches_h5(self):
        from makani_tpu.data.zarr_helper import ZarrDataset

        ds_h5 = MultifilesDataset(self.params, self.params.train_data_path, train=True,
                                  enable_logging=False)
        ds_zr = ZarrDataset(self.params, self.zarr_train, train=True, enable_logging=False)
        self.assertEqual(len(ds_h5), len(ds_zr))
        for idx in [0, len(ds_h5) // 2, len(ds_h5) - 1]:
            for a, b in zip(ds_h5[idx], ds_zr[idx]):
                np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_dispatcher_selects_zarr(self):
        from makani_tpu.data import get_dataloader
        from makani_tpu.data.zarr_helper import ZarrDataset

        loader, dataset = get_dataloader(self.params, self.zarr_train, train=True,
                                         enable_logging=False)
        self.assertIsInstance(dataset, ZarrDataset)
        batch = next(iter(loader))
        self.assertEqual(batch[0].shape[0], self.params.batch_size)

    def test_missing_zarr_raises_clear_error(self):
        import makani_tpu.data.zarr_helper as zh

        saved = sys.modules.pop("zarr")
        try:
            with self.assertRaisesRegex(ImportError, "h5_convert"):
                zh.ZarrDataset(self.params, self.zarr_train, train=True)
        finally:
            sys.modules["zarr"] = saved


class TestZenithAlignment(unittest.TestCase):
    """With n_history>0 the zenith channels must be computed at the SAME times
    as the field windows (the reference's primary DALI reader semantics,
    dali_es_helper_2d.py:167,388; its multifiles loader misaligns them)."""

    def test_zenith_times_match_field_window(self):
        from makani_tpu.utils.zenith_angle import cos_zenith_angle

        with tempfile.TemporaryDirectory() as tmp:
            params = get_default_parameters()
            params["n_history"] = 1
            params["add_zenith"] = True
            params = init_dataset(tmp, params, n_samples_per_year=10, n_years=1,
                                  start_year=2018)
            ds = MultifilesDataset(params, params.train_data_path, train=True,
                                   enable_logging=False)
            idx = 3
            inp, tar, zen_inp, zen_tar = ds[idx]
            self.assertEqual(zen_inp.shape[0], params.n_history + 1)

            jan01 = datetime.datetime(2018, 1, 1, tzinfo=datetime.timezone.utc)
            # the dataset crops the coordinate grid to its local read window
            lon_grid, lat_grid = ds.lon_grid_local, ds.lat_grid_local

            # field input window = samples [idx, idx+dt*n_history]
            inp_times = [jan01 + datetime.timedelta(hours=(idx + o) * params.dhours)
                         for o in range(params.n_history + 1)]
            expected_inp = cos_zenith_angle(inp_times, lon_grid, lat_grid)
            np.testing.assert_allclose(zen_inp[:, 0], expected_inp, rtol=1e-5, atol=1e-6)

            # field target = sample idx + dt*(n_history+1)
            tar_times = [jan01 + datetime.timedelta(
                hours=(idx + params.n_history + 1) * params.dhours)]
            expected_tar = cos_zenith_angle(tar_times, lon_grid, lat_grid)
            np.testing.assert_allclose(zen_tar[:, 0], expected_tar, rtol=1e-5, atol=1e-6)


class TestZarrConvert(unittest.TestCase):
    """tools/zarr_convert.py streaming converter (ref:
    data_process/zarr_convert.py), exercised under a writeable zarr stub
    since the real package is absent in this deployment."""

    def test_convert_roundtrip(self):
        import json

        stub = types.ModuleType("zarr")

        class _Array:
            def __init__(self, path, shape, dtype, chunks):
                self._mm = np.lib.format.open_memmap(
                    path, mode="w+", dtype=dtype, shape=shape)
                self.attrs = {}

            def __setitem__(self, k, v):
                self._mm[k] = v

            def __getitem__(self, k):
                return self._mm[k]

        class _Group:
            def __init__(self, path):
                self.path = path

            def create_array(self, name, shape=None, dtype=None, chunks=None):
                return _Array(os.path.join(self.path, name + ".npy"),
                              shape, dtype, chunks)

        def open_group(path, mode="w"):
            os.makedirs(path, exist_ok=True)
            return _Group(path)

        stub.open_group = open_group
        sys.modules["zarr"] = stub
        try:
            from makani_tpu.tools.zarr_convert import convert_file

            with tempfile.TemporaryDirectory() as tmp:
                params = get_default_parameters()
                params = init_dataset(tmp, params, n_samples_per_year=6, n_years=1)
                src = sorted(os.listdir(params.train_data_path))[0]
                src_path = os.path.join(params.train_data_path, src)
                dst = os.path.join(tmp, src[:-3] + ".zarr")
                metadata = {"coords": {"channel": list(params.channel_names),
                                       "grid_type": "equiangular"}}
                convert_file(src_path, dst, params.h5_path,
                             metadata=metadata, time_chunk=2)

                with h5py.File(src_path, "r") as f:
                    want = f[params.h5_path][...]
                got = np.load(os.path.join(dst, params.h5_path + ".npy"))
                np.testing.assert_array_equal(got, want)
        finally:
            sys.modules.pop("zarr", None)


if __name__ == "__main__":
    unittest.main()
