"""Static conditioning inputs: orography and land-sea mask.

Parity with ref: makani/utils/conditioning_inputs.py:24-42. netCDF4-python is
not available in this environment; NetCDF-4 files are HDF5 containers, so
h5py reads them directly. .npy files are also supported.
"""

import numpy as np
import h5py


def _read_var(path, names):
    if str(path).endswith(".npy"):
        return np.load(path)
    with h5py.File(path, "r") as f:
        for name in names:
            if name in f:
                arr = f[name][...]
                # drop singleton leading (time) dims
                while arr.ndim > 2:
                    arr = arr[0]
                return arr
        raise KeyError(f"None of {names} found in {path}; keys: {list(f.keys())}")


def get_orography(orography_path):
    """Surface geopotential normalized to [0, 1]."""
    orography = np.asarray(_read_var(orography_path, ["Z", "z", "orog", "orography"]), dtype=np.float64)
    orography = (orography - orography.min()) / (orography.max() - orography.min())
    return orography


def get_land_mask(land_mask_path):
    """Land-sea mask in [0, 1]."""
    return np.asarray(_read_var(land_mask_path, ["lsm", "LSM", "land_sea_mask"]))
