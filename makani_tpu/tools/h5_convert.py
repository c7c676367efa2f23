"""Rechunk / convert yearly HDF5 datasets for fast windowed reads.

Capability parity with ref: data_process/h5_convert.py and h5_align.py
(chunking/layout conversion for O_DIRECT-friendly access). Chunk layout
defaults to one (sample, channel) plane per chunk — the loader's read unit.
"""

import argparse
import glob
import os

import numpy as np
import h5py


def convert_file(src, dst, dataset_path="fields", chunk_channels=1, batch=4,
                 dtype=None):
    with h5py.File(src, "r") as fi, h5py.File(dst, "w") as fo:
        ds = fi[dataset_path]
        T, C, H, W = ds.shape
        out_dtype = np.dtype(dtype) if dtype else ds.dtype
        chunks = (1, min(chunk_channels, C), H, W)
        out = fo.create_dataset(dataset_path, shape=ds.shape, dtype=out_dtype, chunks=chunks)
        for t0 in range(0, T, batch):
            out[t0: t0 + batch] = ds[t0: t0 + batch].astype(out_dtype)
        # copy any sibling datasets / attrs
        for key in fi.keys():
            if key != dataset_path:
                fi.copy(key, fo)
        for k, v in fi.attrs.items():
            fo.attrs[k] = v
    return dst


def convert_dir(src_dir, dst_dir, dataset_path="fields", **kwargs):
    os.makedirs(dst_dir, exist_ok=True)
    outs = []
    for src in sorted(glob.glob(os.path.join(src_dir, "????.h5"))):
        dst = os.path.join(dst_dir, os.path.basename(src))
        outs.append(convert_file(src, dst, dataset_path, **kwargs))
    return outs


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    parser.add_argument("--dataset_path", default="fields")
    parser.add_argument("--chunk_channels", default=1, type=int)
    parser.add_argument("--dtype", default=None)
    args = parser.parse_args()
    if os.path.isdir(args.src):
        outs = convert_dir(args.src, args.dst, args.dataset_path,
                           chunk_channels=args.chunk_channels, dtype=args.dtype)
    else:
        outs = [convert_file(args.src, args.dst, args.dataset_path,
                             chunk_channels=args.chunk_channels, dtype=args.dtype)]
    print(f"converted {len(outs)} files")
