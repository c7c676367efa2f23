"""Per-channel histograms over yearly HDF5 files.

Capability parity with ref: data_process/get_histograms.py (MPI-parallel);
process-pool parallel here, STREAMED in bounded time-chunks so real
73-channel 0.25-degree years (~600 GB each) never load into RAM (the
reference streams with 1 GB-chunked MPI allgathers, ref: data_process/
get_stats.py). Outputs histograms.npy (C, bins) and
histogram_bin_edges.npy (C, bins+1).
"""

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np
import h5py

# time-steps per streamed read, sized so a chunk stays ~1 GB at
# 73 x 721 x 1440 f32 (~300 MB/step -> 4 steps)
_DEFAULT_CHUNK_BYTES = 1 << 30


def _chunk_steps(ds):
    bytes_per_step = int(np.prod(ds.shape[1:])) * ds.dtype.itemsize
    return max(1, _DEFAULT_CHUNK_BYTES // max(bytes_per_step, 1))


def _channel_minmax(args):
    path, dataset_path = args
    with h5py.File(path, "r") as f:
        ds = f[dataset_path]
        step = _chunk_steps(ds)
        mins = np.full(ds.shape[1], np.inf, dtype=np.float64)
        maxs = np.full(ds.shape[1], -np.inf, dtype=np.float64)
        for t0 in range(0, ds.shape[0], step):
            block = ds[t0: t0 + step]
            np.minimum(mins, block.min(axis=(0, 2, 3)), out=mins)
            np.maximum(maxs, block.max(axis=(0, 2, 3)), out=maxs)
    return mins, maxs


def _file_histogram(args):
    path, dataset_path, edges = args
    with h5py.File(path, "r") as f:
        ds = f[dataset_path]
        C = ds.shape[1]
        step = _chunk_steps(ds)
        counts = np.zeros((C, edges.shape[1] - 1), dtype=np.int64)
        for t0 in range(0, ds.shape[0], step):
            block = ds[t0: t0 + step]
            for c in range(C):
                counts[c] += np.histogram(block[:, c].ravel(), bins=edges[c])[0]
    return counts


def compute_histograms(data_dir, output_dir, dataset_path="fields", bins=100, workers=4):
    files = sorted(glob.glob(os.path.join(data_dir, "????.h5")))
    if not files:
        raise IOError(f"no yearly h5 files in {data_dir}")
    os.makedirs(output_dir, exist_ok=True)

    with ProcessPoolExecutor(max_workers=workers) as ex:
        mm = list(ex.map(_channel_minmax, [(f, dataset_path) for f in files]))
    mins = np.min([m for m, _ in mm], axis=0)
    maxs = np.max([m for _, m in mm], axis=0)
    edges = np.stack([np.linspace(mins[c], maxs[c], bins + 1) for c in range(len(mins))])

    with ProcessPoolExecutor(max_workers=workers) as ex:
        counts = list(ex.map(_file_histogram, [(f, dataset_path, edges) for f in files]))
    hist = np.sum(counts, axis=0)

    np.save(os.path.join(output_dir, "histograms.npy"), hist)
    np.save(os.path.join(output_dir, "histogram_bin_edges.npy"), edges)
    return hist, edges


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--dataset_path", default="fields")
    parser.add_argument("--bins", default=100, type=int)
    parser.add_argument("--workers", default=4, type=int)
    args = parser.parse_args()
    compute_histograms(args.data_dir, args.output_dir, args.dataset_path, args.bins, args.workers)
    print(f"histograms written to {args.output_dir}")
