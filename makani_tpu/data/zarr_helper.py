"""Zarr dataset support (gated).

Capability slot for ref: makani/utils/dataloaders/zarr_helper.py (xarray/zarr
path). The zarr/xarray packages are not available in this deployment; when
they are, ZarrDataset exposes the MultifilesDataset API over yearly
``????.zarr`` stores. Until then, construction raises a clear error telling
the user to convert to HDF5 (tools/h5_convert.py) or raw shards
(data/native_loader.convert_h5_to_bin).
"""


def _require_zarr():
    try:
        import zarr  # noqa: F401
        import xarray  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "zarr/xarray are not installed in this environment. Convert the "
            "dataset to yearly HDF5 files (makani_tpu/tools/h5_convert.py) or "
            "raw npy shards (makani_tpu.data.native_loader.convert_h5_to_bin) "
            "to use the HDF5/native loaders instead."
        ) from e


class ZarrDataset:
    def __init__(self, params, location, train, enable_logging=True):
        _require_zarr()
        import xarray as xr  # pragma: no cover - exercised only with zarr installed
        raise NotImplementedError(
            "ZarrDataset: zarr available but the reader is not wired in this "
            "build; use the HDF5 or native loaders.")
