"""Assemble yearly multi-channel HDF5 datasets from per-variable sources,
parallel over time ranges.

Capability parity with ref: data_process/parallel_copy.py:1-111 — the
reference MPI-shards the time axis across ranks and writes each source
NetCDF variable into its channel slot of the destination 'fields' dataset.
Here a process pool shards the time axis (no MPI in the TPU stack), and
sources are read with h5py (NetCDF-4 files ARE HDF5; classic NetCDF-3
sources must be converted first — this environment ships no netCDF4
library, see utils/nctools.py).

The channel plan is a JSON list instead of the reference's hard-coded path
table:

    [{"src": "/data/u10_1979.nc", "var": "u", "channel": 0},
     {"src": "/data/v10_1979.nc", "var": "v", "channel": 1}, ...]

Usage: python -m makani_tpu.tools.parallel_copy --plan plan.json \
           --dest 1979.h5 --n-channels 73 [--workers 8] [--batch 64]
"""

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor

import h5py


def _read_range(src, var, t0, t1):
    """Read src[var][t0:t1] (decompression happens in the worker)."""
    with h5py.File(src, "r") as fs:
        block = fs[var][t0:t1]
    # squeeze singleton level axes (NetCDF (t, 1, lat, lon) layouts)
    while block.ndim > 3:
        block = block.squeeze(1)
    return block


def parallel_copy(plan, dest, n_channels, dataset_path="fields", workers=4,
                  batch=64):
    """Parallel READS + a single writer: HDF5 has no safe concurrent-writer
    mode without MPI-IO (the reference used the mpio driver), so worker
    processes do the decompress-heavy reads and the parent streams the
    blocks into the preallocated destination."""
    # size the destination from the first source
    first = plan[0]
    with h5py.File(first["src"], "r") as f:
        v = f[first["var"]]
        n_time = v.shape[0]
        spatial = v.shape[-2:]

    if not os.path.exists(dest):
        with h5py.File(dest, "w") as f:
            f.create_dataset(dataset_path, (n_time, n_channels, *spatial),
                             dtype="f4")

    work = [(entry, t0, min(t0 + batch, n_time))
            for entry in plan for t0 in range(0, n_time, batch)]

    with ProcessPoolExecutor(max_workers=workers) as ex, \
            h5py.File(dest, "r+") as fd:
        vdst = fd[dataset_path]
        # bounded read-ahead so completed blocks don't pile up in RAM when
        # the readers outpace the writer
        depth = max(2 * workers, 2)
        inflight = []
        for entry, t0, t1 in work:
            if len(inflight) >= depth:
                fut, ch, w0, w1 = inflight.pop(0)
                vdst[w0:w1, ch] = fut.result()
            inflight.append((ex.submit(_read_range, entry["src"], entry["var"],
                                       t0, t1), int(entry["channel"]), t0, t1))
        for fut, ch, w0, w1 in inflight:
            vdst[w0:w1, ch] = fut.result()
    return dest


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--plan", type=str, required=True,
                        help="JSON list of {src, var, channel} entries")
    parser.add_argument("--dest", type=str, required=True)
    parser.add_argument("--n-channels", type=int, required=True)
    parser.add_argument("--dataset_path", type=str, default="fields")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args()
    with open(args.plan) as f:
        plan = json.load(f)
    parallel_copy(plan, args.dest, args.n_channels, args.dataset_path,
                  args.workers, args.batch)
    print(f"assembled {args.dest}")
