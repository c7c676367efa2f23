"""Per-channel histograms over yearly HDF5 files.

Capability parity with ref: data_process/get_histograms.py (MPI-parallel);
process-pool parallel here. Outputs histograms.npy (C, bins) and
histogram_bin_edges.npy (C, bins+1).
"""

import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np
import h5py


def _channel_minmax(args):
    path, dataset_path = args
    with h5py.File(path, "r") as f:
        ds = f[dataset_path]
        mins = ds[:].min(axis=(0, 2, 3))
        maxs = ds[:].max(axis=(0, 2, 3))
    return mins, maxs


def _file_histogram(args):
    path, dataset_path, edges = args
    with h5py.File(path, "r") as f:
        data = f[dataset_path][:]
    C = data.shape[1]
    counts = np.stack([
        np.histogram(data[:, c].ravel(), bins=edges[c])[0] for c in range(C)
    ])
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
