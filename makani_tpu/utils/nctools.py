"""Minimal NetCDF-4 read/write via h5py.

The netCDF4-python library is unavailable here; NetCDF-4 files *are* HDF5
files using dimension scales, so h5py reads them directly and can write files
that netCDF4/xarray(h5netcdf) open. Capability parity with the fork's
NetCDF export helpers (ref: makani/third_party/nctools.py; makani/inference.py:244-270).
"""

import numpy as np
import h5py


def write_netcdf(path, variables, dims, global_attrs=None):
    """Write a NetCDF-4-compatible file.

    variables: {name: (dim_names_tuple, ndarray, attrs_dict_or_None)}
    dims: {dim_name: 1d coordinate array}
    """
    with h5py.File(path, "w") as f:
        # netCDF4 signature attribute
        f.attrs["_NCProperties"] = np.bytes_("version=2,makani_tpu=1")
        for name, values in dims.items():
            d = f.create_dataset(name, data=np.asarray(values))
            d.make_scale(name)
        for name, (var_dims, data, attrs) in variables.items():
            v = f.create_dataset(name, data=np.asarray(data, dtype=np.float32))
            for i, dim in enumerate(var_dims):
                v.dims[i].attach_scale(f[dim])
            if attrs:
                for k, a in attrs.items():
                    v.attrs[k] = a
        if global_attrs:
            for k, a in global_attrs.items():
                f.attrs[k] = a


def read_netcdf_var(path, name):
    with h5py.File(path, "r") as f:
        return f[name][...]


def var_shape(path, name):
    """Shape of a variable without reading it (ref nctools.getVarShape)."""
    with h5py.File(path, "r") as f:
        return tuple(f[name].shape)


def create_netcdf(path, name, shape, dim_names, dims=None, dtype="f4",
                  chunks=None, var_attrs=None):
    """Create a NetCDF-4 file with one empty N-d variable for streamed,
    sliced writes (ref: makani/third_party/nctools.py create/ncwriteatt —
    the fork builds multi-GB merged training files incrementally)."""
    with h5py.File(path, "w") as f:
        f.attrs["_NCProperties"] = np.bytes_("version=2,makani_tpu=1")
        for i, dn in enumerate(dim_names):
            coord = None if dims is None else dims.get(dn)
            if coord is None:
                coord = np.arange(shape[i], dtype=np.float64)
            d = f.create_dataset(dn, data=np.asarray(coord))
            d.make_scale(dn)
        v = f.create_dataset(name, shape=shape, dtype=dtype, chunks=chunks,
                             fillvalue=np.nan if dtype in ("f4", "f8") else 0)
        for i, dn in enumerate(dim_names):
            v.dims[i].attach_scale(f[dn])
        if var_attrs:
            for k, a in var_attrs.items():
                v.attrs[k] = a


def write_netcdf_slice(path, name, data, slices=None):
    """Write into an existing variable at the given slice tuple."""
    with h5py.File(path, "a") as f:
        if slices is None:
            f[name][...] = data
        else:
            f[name][tuple(slices)] = data


def write_netcdf_attr(path, name, key, value):
    with h5py.File(path, "a") as f:
        target = f.attrs if name is None else f[name].attrs
        target[key] = value


def write_prediction_file(output_path, data, extra_dims=None):
    """Write predictions shaped (time, var, lat, lon) in the fork's layout:
    one 'var{i}' variable per channel over dims (dim0, dim1, dim2)
    (ref: makani/inference.py:238-256)."""
    T, V, H, W = data.shape
    dims = {
        "dim0": np.arange(T, dtype=np.int16),
        "dim1": np.arange(H, dtype=np.int16),
        "dim2": np.arange(W, dtype=np.int16),
    }
    if extra_dims:
        dims.update(extra_dims)
    variables = {
        f"var{i}": (("dim0", "dim1", "dim2"), data[:, i], None) for i in range(V)
    }
    write_netcdf(output_path, variables, dims)
