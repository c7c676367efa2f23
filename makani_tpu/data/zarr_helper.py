"""Zarr dataset support (gated on the ``zarr`` package).

Capability slot for ref: makani/utils/dataloaders/zarr_helper.py and the
``_get_data_zarr`` path of the DALI reader
(ref: makani/utils/dataloaders/dali_es_helper_2d.py:219-231): yearly
``????.zarr`` stores holding the same (time, channel, lat, lon) array as the
HDF5 files. ZarrDataset shares all window/normalization/sharding logic with
MultifilesDataset — only the storage hooks differ, since zarr arrays support
the same numpy-style slicing as h5py datasets.

The zarr package is optional in this deployment; when missing, construction
raises a clear error pointing at the HDF5/native converters.
"""

from makani_tpu.data.dataset import MultifilesDataset


def _require_zarr():
    try:
        import zarr  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "zarr is not installed in this environment. Convert the dataset "
            "to yearly HDF5 files (makani_tpu/tools/h5_convert.py) or raw npy "
            "shards (makani_tpu.data.native_loader.convert_h5_to_bin) to use "
            "the HDF5/native loaders instead."
        ) from e


class ZarrDataset(MultifilesDataset):
    """MultifilesDataset over yearly ``????.zarr`` stores."""

    _file_pattern = "????.zarr"

    def __init__(self, params, location, train, enable_logging=True):
        _require_zarr()
        super().__init__(params, location, train, enable_logging)

    def _peek_shape(self, path):
        import zarr

        return zarr.open(path, mode="r")[self.dataset_path].shape

    def _open_file(self, year_idx):
        import zarr

        store = zarr.open(self.files_paths[year_idx], mode="r")
        self.files[year_idx] = store[self.dataset_path]
