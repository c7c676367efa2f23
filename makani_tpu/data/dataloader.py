"""Dataloader dispatch + host-side async prefetch pipeline.

TPU-native replacement for the reference's DALI GPU pipeline
(ref: makani/utils/dataloaders/data_loader_dali_2d.py:45-349) and dataloader
dispatcher (ref: makani/utils/dataloader.py:27-151):

- background worker threads read+normalize HDF5 windows (h5py releases the
  GIL during IO), a bounded queue double-buffers batches ahead of the step,
- per-epoch seeded permutation + data-rank sharding reproduce the GeneralES
  sample accounting (ref: dali_es_helper_2d.py:287-317,441-457),
- train-time random longitude roll and gaussian noise augmentation run as
  part of the jitted step (device ops), not on the host.
"""

import concurrent.futures
import logging
import os
import queue
import threading
import time

import numpy as np

from makani_tpu.data.dataset import MultifilesDataset, compute_split_shapes

logger = logging.getLogger(__name__)


def init_distributed_io(params):
    """Set io grid/rank so each spatial rank reads only its lat/lon patch
    (ref: makani/utils/dataloader.py:27-60).

    Under the single-controller GSPMD design, host-side spatial IO sharding
    only applies along mesh axes sharded ACROSS processes (every local device
    of this process shares one coordinate): the process reads just that
    patch, and Trainer._device_batch assembles the global array from the
    per-process patches. Axes spanning devices *within* a process read fully
    — GSPMD slices on device."""
    import jax
    from makani_tpu.parallel import comm

    params["data_num_shards"] = comm.get_size("data")
    params["data_shard_id"] = comm.get_rank("data")

    io_grid = [1, 1, 1]
    io_rank = [0, 0, 0]
    if comm.get_size("model") > 1 and jax.process_count() > 1:
        for i, ax in enumerate(("h", "w")):
            coord = comm.process_axis_coord(ax)
            if comm.get_size(ax) > 1 and coord is not None:
                io_grid[i + 1] = comm.get_size(ax)
                io_rank[i + 1] = coord
    params["io_grid"] = io_grid
    params["io_rank"] = io_rank
    return params


class DummyDataset:
    """Synthetic random data matching all shape/normalization metadata
    (ref: makani/utils/dataloaders/data_loader_dummy.py)."""

    def __init__(self, params, location, train):
        self.dt = params.dt
        self.n_history = params.n_history
        self.n_future = params.valid_autoreg_steps if not train else params.n_future
        self.in_channels = np.array(params.in_channels)
        self.out_channels = np.array(params.out_channels)
        self.n_in_channels = len(self.in_channels)
        self.n_out_channels = len(self.out_channels)
        self.add_zenith = params.get("add_zenith", False)
        self.n_samples = params.get("n_train_samples_per_epoch", 64) if train else params.get("n_eval_samples", 16)

        self.img_shape = (params.img_shape_x, params.img_shape_y)
        self.img_shape_x, self.img_shape_y = self.img_shape
        self.img_crop_shape_x, self.img_crop_shape_y = self.img_shape
        self.img_crop_offset_x = self.img_crop_offset_y = 0
        self.img_local_shape_x, self.img_local_shape_y = self.img_shape
        self.img_local_offset_x = self.img_local_offset_y = 0

        self.rng = np.random.RandomState(333)

    def __len__(self):
        return self.n_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        inp = rng.randn(self.n_history + 1, self.n_in_channels, *self.img_shape).astype(np.float32)
        tar = rng.randn(self.n_future + 1, self.n_out_channels, *self.img_shape).astype(np.float32)
        if self.add_zenith:
            zen_inp = rng.randn(self.n_history + 1, 1, *self.img_shape).astype(np.float32)
            zen_tar = rng.randn(self.n_future + 1, 1, *self.img_shape).astype(np.float32)
            return inp, tar, zen_inp, zen_tar
        return inp, tar

    def get_output_normalization(self):
        n = self.n_out_channels
        return np.zeros((1, n, 1, 1), np.float32), np.ones((1, n, 1, 1), np.float32)

    def get_input_normalization(self):
        n = self.n_in_channels
        return np.zeros((1, n, 1, 1), np.float32), np.ones((1, n, 1, 1), np.float32)


class PrefetchingLoader:
    """Iterates batches with background read-ahead.

    Sample accounting per epoch (matches GeneralES): a seeded permutation of
    all valid indices, truncated to n_samples_per_epoch, sharded over data
    ranks, grouped into local batches. Seeds are (base_seed + epoch) so every
    rank draws the SAME permutation (ref: dali_es_helper_2d.py:441-457).
    """

    def __init__(self, dataset, batch_size, shuffle, num_workers=2,
                 n_samples_per_epoch=None, num_shards=1, shard_id=0,
                 base_seed=333, drop_last=True, prefetch_depth=2,
                 samples_offset=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.base_seed = base_seed
        self.drop_last = drop_last
        self.prefetch_depth = prefetch_depth
        # offset for choosing inference initial conditions
        # (fork capability, ref: dali_es_helper_2d.py:303-307)
        self.samples_offset = samples_offset
        self.epoch = 0

        n_avail = len(dataset) - samples_offset
        self.n_samples_per_epoch = min(n_samples_per_epoch or n_avail, n_avail)
        n_shard = self.n_samples_per_epoch // num_shards
        self.num_batches = n_shard // batch_size if drop_last else -(-n_shard // batch_size)
        if self.num_batches == 0:
            raise ValueError(
                f"Not enough samples per shard ({n_shard}) for one batch of {batch_size}")

        self._executor = concurrent.futures.ThreadPoolExecutor(max_workers=self.num_workers)

    def __len__(self):
        return self.num_batches

    def _epoch_indices(self):
        n_avail = len(self.dataset) - self.samples_offset
        if self.shuffle:
            rng = np.random.RandomState(self.base_seed + self.epoch)
            perm = rng.permutation(n_avail)[: self.n_samples_per_epoch]
        else:
            perm = np.arange(self.n_samples_per_epoch)
        perm = perm + self.samples_offset
        # shard: strided to balance years across ranks
        return perm[self.shard_id:: self.num_shards]

    def _collate(self, samples):
        n_fields = len(samples[0])
        if len(samples) == 1:
            # batch-1 (the flagship case): expand_dims is a VIEW — skip the
            # np.stack copy of the ~600MB sample
            return tuple(samples[0][i][None] for i in range(n_fields))
        return tuple(np.stack([s[i] for s in samples], axis=0) for i in range(n_fields))

    def wait_prefetch_idle(self, timeout=180):
        """Block until no prefetch read is in flight. Host-contention
        escape hatch for remote-relay backends: a host->device transfer
        streamed while the read workers saturate a small host can starve
        and fail spuriously (see Trainer._put_with_retry). Steady-state
        overlap is unaffected — callers use this only for an epoch's first
        transfers and on transfer-retry paths."""
        import concurrent.futures as cf
        fs = [f for f in getattr(self, "_inflight", []) if f is not None]
        if fs:
            cf.wait(fs, timeout=timeout)

    def __iter__(self):
        indices = self._epoch_indices()
        batches = [indices[i * self.batch_size: (i + 1) * self.batch_size]
                   for i in range(self.num_batches)]
        self.epoch += 1

        def load_batch(batch_idx):
            samples = [self.dataset[int(i)] for i in batches[batch_idx]]
            return self._collate(samples)

        depth = min(self.prefetch_depth, len(batches))
        futures = [self._executor.submit(load_batch, i) for i in range(depth)]
        self._inflight = futures
        for i in range(len(batches)):
            batch = futures[i % depth].result()
            nxt = i + depth
            if nxt < len(batches):
                futures[nxt % depth] = self._executor.submit(load_batch, nxt)
            yield batch


def get_dataloader(params, location, train=True, final_eval=False, enable_logging=True):
    """Construct (dataloader, dataset) (ref: makani/utils/dataloader.py:63-151)."""
    import jax

    import glob as _glob

    if params.get("enable_synthetic_data", False):
        dataset = DummyDataset(params, location, train)
    elif params.get("enable_native_loader", False) or (
            isinstance(location, str)
            and _glob.glob(os.path.join(location, "????.npy"))
            and not _glob.glob(os.path.join(location, "????.h5"))):
        # native C++ raw-shard reader (the DALI-analog data plane)
        from makani_tpu.data.native_loader import BinaryDataset
        dataset = BinaryDataset(params, location, train, enable_logging)
    elif params.get("enable_zarr", False) or (
            isinstance(location, str)
            and _glob.glob(os.path.join(location, "????.zarr"))
            and not _glob.glob(os.path.join(location, "????.h5"))):
        from makani_tpu.data.zarr_helper import ZarrDataset
        dataset = ZarrDataset(params, location, train, enable_logging)
    else:
        dataset = MultifilesDataset(params, location, train, enable_logging)

    n_samples_per_epoch = None
    if train and params.get("n_train_samples_per_epoch", None):
        n_samples_per_epoch = params.n_train_samples_per_epoch
    if (not train) and params.get("n_eval_samples", None):
        n_samples_per_epoch = params.n_eval_samples

    # single-controller semantics: params.batch_size is the per-data-rank
    # batch (like the reference, ref: makani/utils/dataloader.py:32-33);
    # each *process* loads the slice of the global batch owned by its local
    # devices and Trainer._device_batch assembles the global sharded array.
    from makani_tpu.parallel import comm
    n_data = max(params.get("data_num_shards", 1), 1)
    n_proc = jax.process_count()
    global_batch = int(params.batch_size) * n_data
    if n_proc == 1:
        num_shards, shard_id, local_batch = 1, 0, global_batch
    elif n_data % n_proc == 0:
        # DP across processes: each process owns n_data/n_proc data coords
        num_shards, shard_id = n_proc, jax.process_index()
        local_batch = int(params.batch_size) * (n_data // n_proc)
        assert local_batch * n_proc == global_batch
    elif n_proc % n_data == 0 and comm.process_axis_coord("data") is not None:
        # model axes span processes: every process sharing a data coordinate
        # loads the SAME shard (replicated feeding, like the reference's
        # rank-local DDP semantics where data_shard_id is the data rank)
        num_shards, shard_id = n_data, comm.process_axis_coord("data")
        local_batch = int(params.batch_size)
    else:
        raise ValueError(
            f"Unsupported process/data factorization: {n_proc} processes, "
            f"data axis {n_data} — data coords must not straddle processes")

    loader = PrefetchingLoader(
        dataset,
        batch_size=local_batch,
        shuffle=train,
        num_workers=params.get("num_data_workers", 2),
        n_samples_per_epoch=n_samples_per_epoch,
        num_shards=num_shards,
        shard_id=shard_id,
        base_seed=params.get("global_seed", 333),
        drop_last=True,
        samples_offset=0 if train else params.get("samples_offset", 0) or 0,
    )
    # expose normalization accessors like the reference loaders
    loader.get_output_normalization = dataset.get_output_normalization
    loader.get_input_normalization = dataset.get_input_normalization

    if train and params.get("enable_benchy", False):
        loader = BenchyLoader(loader, params)
    return loader, dataset


class BenchyLoader:
    """Throughput-instrumented loader wrapper (the reference wraps the train
    loader in the external `benchy` BenchmarkGenericIteratorWrapper when
    --enable_benchy is set, ref: makani/utils/dataloader.py:140-143). Logs
    batches/s and effective GB/s every epoch."""

    def __init__(self, loader, params):
        self._loader = loader
        self._log = logging.getLogger(__name__)

    def __len__(self):
        return len(self._loader)

    def __getattr__(self, name):
        return getattr(self._loader, name)

    def __iter__(self):
        t0 = time.perf_counter()
        n, nbytes = 0, 0
        for batch in self._loader:
            n += 1
            nbytes += sum(int(np.asarray(b).nbytes) for b in batch
                          if hasattr(b, "nbytes") or hasattr(b, "shape"))
            yield batch
        dt = max(time.perf_counter() - t0, 1e-9)
        self._log.info(
            f"[benchy] {n} batches in {dt:.2f}s: {n / dt:.2f} batches/s, "
            f"{nbytes / dt / 1e6:.2f} MB/s effective")
