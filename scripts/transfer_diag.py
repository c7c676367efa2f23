"""Transfer-path lifecycle diagnostic for the axon relay (round 5).

The shipping-Trainer drive dies at the epoch-first batch transfer with
RESOURCE_EXHAUSTED on EVERY put size (4 MB ramp chunks included) even on a
freshly-booted relay with zero dead-client debris — while the 268 MB warmup
put a minute earlier succeeds. This script brackets WHICH lifecycle stage
poisons the transfer path by probing plain host->device puts:

  A. fresh process            (before any model state exists)
  B. after Trainer.__init__   (4.6 GB state resident; MAKANI_NO_WARM=1
                               skips the init warmup put so the first
                               post-init probe is the first big transfer)
  C. after the loader's first batch is materialized on HOST + quiesce
  D. the real _device_batch + train steps (the production path)

On a probe failure it retries every 30 s for up to RECOVER_S (default 480)
and logs the recovery latency — distinguishing "poisoned until relay GC"
from "permanently dead for this process".

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
         python scripts/transfer_diag.py > runs/r5_transfer_diag.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MAKANI_NO_WARM", "1")

import numpy as np
import jax
import jax.numpy as jnp

RECOVER_S = float(os.environ.get("RECOVER_S", 480))


def stamp():
    return time.strftime("%H:%M:%S")


def live_gb():
    try:
        return sum(a.nbytes for a in jax.live_arrays()) / 1e9
    except Exception:
        return float("nan")


def probe(tag, mb, retry=True):
    x = np.zeros(((mb << 20) // 4,), np.float32)
    t_first = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        t0 = time.perf_counter()
        try:
            a = jnp.asarray(x)
            float(a[0])
            dt = time.perf_counter() - t0
            extra = (f" (recovered after {time.perf_counter()-t_first:.0f}s, "
                     f"attempt {attempt})" if attempt > 1 else "")
            print(f"[{stamp()}] [{tag}] put {mb}MB OK in {dt:.1f}s "
                  f"(live {live_gb():.2f} GB){extra}", flush=True)
            del a
            return True
        except Exception as e:
            msg = str(e).replace("\n", " ")[:100]
            print(f"[{stamp()}] [{tag}] put {mb}MB FAIL attempt {attempt}: "
                  f"{type(e).__name__} {msg}", flush=True)
            if not retry or time.perf_counter() - t_first > RECOVER_S:
                return False
            time.sleep(30)


def main():
    print(f"[{stamp()}] devices: {jax.devices()}", flush=True)

    # --- stage A: fresh process
    probe("A-fresh", 4)
    probe("A-fresh", 64)
    probe("A-fresh", 300)

    # --- stage B: full Trainer construction (bare flagship config)
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    from makani_tpu.parallel import comm
    from makani_tpu.utils.yparams import YParams
    from makani_tpu.utils.dataset_metadata import parse_dataset_metadata

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    comm.reset()
    comm.init(devices=jax.devices()[:1])
    params = YParams(os.path.join(repo, "config", "sfnonet.yaml"),
                     os.environ.get("DIAG_CONFIG", "flagship_synth_drive_bare"))
    params["world_size"] = comm.get_world_size()
    params["global_batch_size"] = params.batch_size
    params["amp_mode"] = "bf16"
    params["checkpointing"] = 2
    params["multistep_count"] = 1
    params["n_future"] = 0
    params["log_to_screen"] = True
    params["print_timings_frequency"] = -1
    exp_dir = os.path.join(repo, "runs", "transfer_diag")
    os.makedirs(os.path.join(exp_dir, "training_checkpoints"), exist_ok=True)
    params["experiment_dir"] = exp_dir
    params["checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "ckpt")
    params["best_checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "best")
    params["resuming"] = False
    params, _ = parse_dataset_metadata(params["metadata_json_path"], params=params)

    from makani_tpu.utils.trainer import Trainer
    t0 = time.perf_counter()
    trainer = Trainer(params, world_rank=0)
    print(f"[{stamp()}] Trainer constructed in {time.perf_counter()-t0:.0f}s "
          f"(live {live_gb():.2f} GB)", flush=True)

    probe("B-postinit", 4)
    probe("B-postinit", 64)
    probe("B-postinit", 300)

    # --- stage C: loader warm, first batch on host, workers quiesced
    t0 = time.perf_counter()
    data_iter = iter(trainer.train_dataloader)
    data = next(data_iter)
    trainer._quiesce_loaders()
    print(f"[{stamp()}] first host batch ready in {time.perf_counter()-t0:.0f}s "
          f"({sum(d.nbytes for d in data if d is not None)/1e6:.0f} MB)",
          flush=True)
    probe("C-postloader", 4)
    probe("C-postloader", 300)

    # --- stage D: the production path
    t0 = time.perf_counter()
    inp, tar, zen_inp, zen_tar = trainer._device_batch(data)
    print(f"[{stamp()}] _device_batch OK in {time.perf_counter()-t0:.0f}s "
          f"(live {live_gb():.2f} GB)", flush=True)

    lr = jnp.float32(trainer.scheduler(1))
    rng = jax.random.fold_in(trainer.dropout_key, 1)
    t0 = time.perf_counter()
    trainer.model_params, trainer.opt_state, loss = trainer.train_step(
        trainer.model_params, trainer.opt_state, inp, tar, zen_inp, zen_tar,
        lr, rng)
    print(f"[{stamp()}] train_step compile+run {time.perf_counter()-t0:.0f}s "
          f"loss={float(loss):.4f} (live {live_gb():.2f} GB)", flush=True)

    # a few more real batches through the full path
    n_more = int(os.environ.get("DIAG_STEPS", 6))
    t0 = time.perf_counter()
    done = 0
    for i in range(n_more):
        try:
            data = next(data_iter)
        except StopIteration:
            break
        inp, tar, zen_inp, zen_tar = trainer._device_batch(data)
        lr = jnp.float32(trainer.scheduler(i + 2))
        rng = jax.random.fold_in(trainer.dropout_key, i + 2)
        trainer.model_params, trainer.opt_state, loss = trainer.train_step(
            trainer.model_params, trainer.opt_state, inp, tar, zen_inp,
            zen_tar, lr, rng)
        done += 1
    lv = float(loss)
    dt = time.perf_counter() - t0
    print(f"[{stamp()}] {done} more steps in {dt:.1f}s = {done/dt:.2f} steps/s "
          f"(transfer+step pipeline), loss={lv:.4f}", flush=True)
    print(f"[{stamp()}] DIAG COMPLETE", flush=True)


if __name__ == "__main__":
    main()
