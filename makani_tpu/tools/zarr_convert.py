"""Convert yearly ERA5 HDF5 files to zarr stores.

Capability parity with ref: /root/reference/data_process/zarr_convert.py:1-98
(h5 -> zarr via xarray/dask there). This implementation streams the (T, C, H,
W) array in time-chunks through the zarr API directly — no dask/xarray
dependency — and attaches the channel/lat/lon coordinate metadata from the
dataset ``data.json`` when available, so the resulting stores are readable by
data/zarr_helper.ZarrDataset (yearly ``????.zarr`` pattern).

Gated on the optional ``zarr`` package (absent in this deployment: the tool
exits with a clear message; tests exercise it under the same gate as
ZarrDataset).
"""

import argparse
import glob
import json
import os
import shutil

import numpy as np


def convert_file(src, dst, dataset_path="fields", metadata=None,
                 time_chunk=4, overwrite=False):
    """One HDF5 file -> one zarr store. Returns the destination path."""
    import h5py
    import zarr

    if os.path.exists(dst):
        if not overwrite:
            print(f"File {dst} already exists, skipping.", flush=True)
            return dst
        shutil.rmtree(dst)

    with h5py.File(src, "r") as f:
        ds = f[dataset_path]
        T, C, H, W = ds.shape
        root = zarr.open_group(dst, mode="w")
        out = root.create_array(
            dataset_path, shape=ds.shape, dtype=ds.dtype,
            chunks=(min(time_chunk, T), C, H, W),
        ) if hasattr(root, "create_array") else root.create_dataset(
            dataset_path, shape=ds.shape, dtype=ds.dtype,
            chunks=(min(time_chunk, T), C, H, W),
        )
        for t0 in range(0, T, time_chunk):
            out[t0: t0 + time_chunk] = ds[t0: t0 + time_chunk]

        # coordinate metadata (channel names, lat/lon) from data.json
        if metadata is not None:
            coords = metadata.get("coords", {})
            attrs = {
                "channel": coords.get("channel", []),
                "lat": list(np.asarray(coords.get("lat", [])).tolist()),
                "lon": list(np.asarray(coords.get("lon", [])).tolist()),
                "grid_type": coords.get("grid_type", "equiangular"),
            }
            out.attrs.update({k: v for k, v in attrs.items() if v})
    return dst


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True,
                        help="Directory with yearly ????.h5 files.")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Directory for ????.zarr stores.")
    parser.add_argument("--dataset_path", type=str, default="fields")
    parser.add_argument("--metadata_json_path", type=str, default=None,
                        help="Optional data.json for coordinate attrs.")
    parser.add_argument("--time_chunk", type=int, default=4)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()

    try:
        import zarr  # noqa: F401
    except ImportError:
        raise SystemExit(
            "zarr is not installed in this environment; install it or keep "
            "the HDF5/native formats (tools/h5_convert.py, "
            "native_loader.convert_h5_to_bin).")

    metadata = None
    if args.metadata_json_path:
        with open(args.metadata_json_path) as f:
            metadata = json.load(f)

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.input_dir, "????.h5")))
    if not files:
        raise SystemExit(f"no ????.h5 files in {args.input_dir}")
    for src in files:
        year = os.path.splitext(os.path.basename(src))[0]
        dst = os.path.join(args.output_dir, f"{year}.zarr")
        print(f"Converting {src} -> {dst}", flush=True)
        convert_file(src, dst, args.dataset_path, metadata,
                     args.time_chunk, args.overwrite)


if __name__ == "__main__":
    main()
