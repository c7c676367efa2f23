"""Benchmark harness: SFNO-73ch training throughput on the local chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The flagship config is the reference's canonical single-device model
(SFNO 73ch, 721x1440, embed 384, 8 layers, scale_factor 3, bf16 AMP;
ref: config/sfnonet.yaml:162-173). The reference publishes no throughput
numbers (BASELINE.md), so vs_baseline is reported against the previous
round's value when available (BENCH_prev.json), else 1.0.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def bench_sht():
    """SHT microbenchmark: grid-points/s of analysis+synthesis at the
    flagship resolution (the MXU-bound Legendre+DFT matmul chain)."""
    import jax
    import jax.numpy as jnp
    from makani_tpu.ops import RealSHT, InverseRealSHT

    tm = os.environ.get("BENCH_TABLES")
    if tm:
        from makani_tpu.ops.sht import set_table_mode
        set_table_mode(tm)

    nlat = int(os.environ.get("BENCH_NLAT", 721))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 73))
    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    lmax = nlat // 3
    mmax = (nlon // 3) // 2 + 1

    bp = os.environ.get("BENCH_PRECISION")
    if bp:
        from makani_tpu.ops.sht import set_transform_precision
        set_transform_precision(bp)

    from makani_tpu.ops.device_tables import legpoly_device, rdft_device, irdft_device
    from makani_tpu.ops.sht import _theta_weights, get_transform_precision, transform_einsum

    tq, wq_np = _theta_weights("equiangular", nlat)
    prec = get_transform_precision()

    x = jnp.asarray(np.random.RandomState(0).randn(1, chans, nlat, nlon).astype(np.float32))

    # build tables once, loop over the pure matmul chain (what a fused
    # training loop amortizes): DFT -> quad weights -> Legendre -> inverse
    @jax.jit
    def f(v):
        pct = legpoly_device(mmax, lmax, tuple(tq))
        C, S = rdft_device(nlon, mmax, scale="integral")
        Cs, Ss = irdft_device(nlon, mmax, scale="synthesis")
        wq = jnp.asarray(wq_np.astype(np.float32))

        def roundtrip(i, a):
            # transform_einsum honors the extended modes ("mixed" runs the
            # grid-side DFT dots at 1-pass bf16, coefficient dots at HIGH)
            re = transform_einsum("...j,jm->...m", a, C, prec, stage="grid") * wq[:, None]
            im = -transform_einsum("...j,jm->...m", a, S, prec, stage="grid") * wq[:, None]
            cre = transform_einsum("...km,mlk->...lm", re, pct, prec)
            cim = transform_einsum("...km,mlk->...lm", im, pct, prec)
            zre = transform_einsum("...lm,mlk->...km", cre, pct, prec)
            zim = transform_einsum("...lm,mlk->...km", cim, pct, prec)
            return (transform_einsum("...m,mj->...j", zre, Cs, prec, stage="grid")
                    - transform_einsum("...m,mj->...j", zim, Ss, prec, stage="grid"))

        # host-materialized scalar: block_until_ready does not truly
        # synchronize on some remote backends
        return jnp.sum(jax.lax.fori_loop(0, n_iters, roundtrip, v))

    float(f(x))

    t0 = time.perf_counter()
    float(f(x))
    dt = time.perf_counter() - t0

    gridpoints_per_sec = n_iters * chans * nlat * nlon / dt
    tag = bp or "high"
    print(json.dumps({
        "metric": f"SHT roundtrip {nlat}x{nlon} lmax{lmax} x{chans}ch ({tag})",
        "value": round(gridpoints_per_sec / 1e9, 4),
        "unit": "Ggridpoints/sec",
        "vs_baseline": 1.0,
    }))


def bench_loader():
    """Data-pipeline throughput (the reference's --enable_benchy capability):
    HDF5 multifiles loader vs the native C++ raw-shard loader, GB/s."""
    import tempfile

    from makani_tpu.parallel import comm
    import jax
    comm.reset()
    comm.init(devices=jax.devices()[:1])

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.data import get_dataloader
    from makani_tpu.data.native_loader import convert_h5_to_bin

    nlat = int(os.environ.get("BENCH_NLAT", 181))
    nlon = int(os.environ.get("BENCH_NLON", 360))
    chans = int(os.environ.get("BENCH_CHANS", 20))
    samples = int(os.environ.get("BENCH_SAMPLES", 64))

    tmp = tempfile.mkdtemp()
    params = get_default_parameters()
    params["img_shape_x"], params["img_shape_y"] = nlat, nlon
    params["in_channels"] = list(range(chans))
    params["out_channels"] = list(range(chans))
    params["channel_names"] = [f"c{i}" for i in range(chans)]
    params = init_dataset(tmp, params, n_samples_per_year=samples, n_years=1)
    params["batch_size"] = 4
    params["num_data_workers"] = 4

    # BENCH_ODIRECT=1: route the native loader through O_DIRECT (aligned
    # bounce-buffer reads in csrc) — page cache bypassed, so this measures
    # true storage bandwidth instead of cache hits
    params["enable_odirect"] = bool(int(os.environ.get("BENCH_ODIRECT", 0)))

    results = {}
    bin_dir = os.path.join(tmp, "bin")
    convert_h5_to_bin(params.train_data_path, bin_dir)
    for name, location in [("h5", params.train_data_path), ("native", bin_dir)]:
        loader, _ = get_dataloader(params, location, train=True)
        next(iter(loader))  # warm
        nbytes = 0
        t0 = time.perf_counter()
        for batch in loader:
            nbytes += sum(b.nbytes for b in batch)
        dt = time.perf_counter() - t0
        results[name] = nbytes / dt / 1024**3

    print(json.dumps({
        "metric": f"data loader throughput {chans}ch {nlat}x{nlon} (h5 {results['h5']:.2f} GB/s)",
        "value": round(results["native"], 4),
        "unit": "GB/s (native loader)",
        "vs_baseline": round(results["native"] / max(results["h5"], 1e-9), 2),
    }))


def bench_loader_gate():
    """Flagship-rate loader gate (VERDICT r2 #7): drives PrefetchingLoader +
    the native BinaryDataset at the full 73ch 721x1440 sample shape and
    checks sustained throughput against what the train step consumes
    (steps/s x bytes/step). Set BENCH_STEPS to the measured train rate
    (default: the current flagship number) and BENCH_COLD=1 to drop the
    page cache first (needs root; the native loader's O_DIRECT preads
    bypass it anyway)."""
    import tempfile

    from makani_tpu.parallel import comm
    import jax
    comm.reset()
    comm.init(devices=jax.devices()[:1])

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from testutils import get_default_parameters, init_dataset
    from makani_tpu.data import get_dataloader
    from makani_tpu.data.native_loader import convert_h5_to_bin

    nlat = int(os.environ.get("BENCH_NLAT", 721))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 73))
    samples = int(os.environ.get("BENCH_SAMPLES", 12))
    steps_per_s = float(os.environ.get("BENCH_STEPS", 3.59))

    tmp = tempfile.mkdtemp(dir=os.environ.get("BENCH_TMPDIR"))
    params = get_default_parameters()
    params["img_shape_x"], params["img_shape_y"] = nlat, nlon
    params["in_channels"] = list(range(chans))
    params["out_channels"] = list(range(chans))
    params["channel_names"] = [f"c{i}" for i in range(chans)]
    print(f"# writing {samples} flagship samples "
          f"({samples * chans * nlat * nlon * 4 / 1e9:.1f} GB h5 + bin)...",
          file=sys.stderr, flush=True)
    params = init_dataset(tmp, params, n_samples_per_year=samples, n_years=1)
    params["batch_size"] = 1
    params["num_data_workers"] = int(os.environ.get("BENCH_WORKERS", 4))
    # BENCH_ODIRECT=1: route the gate through O_DIRECT preads (page cache
    # bypassed in csrc) — the verdict-r4 #5 rate question is measured HERE,
    # at the flagship sample shape, not on the small bench_loader shapes
    params["enable_odirect"] = bool(int(os.environ.get("BENCH_ODIRECT", 0)))

    bin_dir = os.path.join(tmp, "bin")
    convert_h5_to_bin(params.train_data_path, bin_dir)

    if int(os.environ.get("BENCH_COLD", 1)):
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3\n")
            print("# page cache dropped", file=sys.stderr, flush=True)
        except OSError as e:
            print(f"# could not drop page cache ({e}); native loader uses "
                  "O_DIRECT regardless", file=sys.stderr, flush=True)

    loader, _ = get_dataloader(params, bin_dir, train=True)
    nbytes, nbatches = 0, 0
    t0 = time.perf_counter()
    for _ in range(2):
        for batch in loader:
            nbytes += sum(b.nbytes for b in batch)
            nbatches += 1
    dt = time.perf_counter() - t0
    gbs = nbytes / dt / 1e9

    # a train step consumes one (inp, tar) pair per batch element
    bytes_per_step = 2 * chans * nlat * nlon * 4
    required = steps_per_s * bytes_per_step / 1e9
    ok = gbs >= required
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "metric": f"native loader sustained rate {chans}ch {nlat}x{nlon} "
                  f"(required {required:.2f} GB/s @ {steps_per_s} steps/s)",
        "value": round(gbs, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbs / required, 3),
        "gate": "pass" if ok else "FAIL",
    }))
    if not ok:
        sys.exit(1)


def bench_trainer():
    """Production-path throughput: the SHIPPING Trainer — preprocessor,
    LossHandler, metrics buffers, auto-layouts, donation through
    _with_tables, native C++ loader data plane — driven on the chip via
    train_one_epoch/validate_one_epoch (round-4 verdict #1: every prior
    on-chip number came from a hand-built twin of the step, not the
    product). Also exercises the full AR validation rollout and an on-chip
    checkpoint save+restore.

    Config: BENCH_CONFIG (default flagship_synth_drive_bare — the bench-
    twin-shaped flagship, so steps/s reconciles against BENCH_MODE=train).
    The synthetic-AR dataset is generated on first use (BENCH_SAMPLES
    train samples, default 24 ≈ 7 GB)."""
    import logging

    import jax
    from makani_tpu.parallel import comm
    from makani_tpu.utils.yparams import YParams
    from makani_tpu.utils.dataset_metadata import parse_dataset_metadata

    quiet = bool(int(os.environ.get("BENCH_QUIET", 0)))
    if not quiet:
        logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    repo = os.path.dirname(os.path.abspath(__file__))
    os.chdir(repo)  # config data paths are repo-relative

    cfg_name = os.environ.get("BENCH_CONFIG", "flagship_synth_drive_bare")
    params = YParams(os.path.join(repo, "config", "sfnonet.yaml"), cfg_name)

    data_root = os.path.join(repo, "datasets", "synthetic_flagship")
    if "synthetic_flagship" in params["metadata_json_path"] \
            and not os.path.exists(os.path.join(data_root, "data.json")):
        n_train = int(os.environ.get("BENCH_SAMPLES", 24))
        print(f"# generating synthetic flagship AR dataset ({n_train} train "
              f"samples, ~{n_train * 0.3:.0f} GB)...", file=sys.stderr, flush=True)
        from makani_tpu.tools.make_synthetic_dataset import make_dataset
        make_dataset(data_root, img_shape=(721, 1440),
                     channels=[f"c{i}" for i in range(73)],
                     n_samples_per_year=n_train, n_valid_samples=24,
                     mode="ar", fmt="bin", invariants=True)

    comm.reset()
    comm.init(devices=jax.devices()[:1])

    # the param assembly train.py's CLI performs (makani_tpu/train.py:66-124)
    params["world_size"] = comm.get_world_size()
    params["global_batch_size"] = params.batch_size
    params["amp_mode"] = os.environ.get("BENCH_AMP", "bf16")
    params["checkpointing"] = int(os.environ.get("BENCH_CKPT", 2))
    params["multistep_count"] = 1
    params["n_future"] = 0
    params["enable_synthetic_data"] = False
    params["log_to_screen"] = not quiet
    params["print_timings_frequency"] = int(os.environ.get("BENCH_PRINT_FREQ", -1))
    exp_dir = os.path.join(repo, "runs", f"bench_trainer_{cfg_name}")
    os.makedirs(os.path.join(exp_dir, "training_checkpoints"), exist_ok=True)
    params["experiment_dir"] = exp_dir
    params["checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "ckpt")
    params["best_checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "best_ckpt")
    params["resuming"] = False
    params, _ = parse_dataset_metadata(params["metadata_json_path"], params=params)

    from makani_tpu.utils.trainer import Trainer

    t0 = time.perf_counter()
    trainer = Trainer(params, world_rank=0)
    print(f"# Trainer constructed (init compiled) in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # epoch 1: train-step compile + warmup; epoch 2: the measured number
    t0 = time.perf_counter()
    t1, _, logs1 = trainer.train_one_epoch()
    print(f"# epoch 1 (compile+run): {logs1['train_steps']} steps in "
          f"{t1:.1f}s, loss {logs1['loss']:.4f}", file=sys.stderr, flush=True)
    t2, _, logs2 = trainer.train_one_epoch()
    steps_per_sec = logs2["train_steps"] / t2
    print(f"# epoch 2 (measured): {logs2['train_steps']} steps in {t2:.1f}s "
          f"= {steps_per_sec:.3f} steps/s, loss {logs2['loss']:.4f}, "
          f"loader-wait {100 * trainer._last_data_wait_frac:.0f}%",
          file=sys.stderr, flush=True)

    # full AR validation (valid_autoreg_steps rollout through _eval_ar_step)
    t0 = time.perf_counter()
    vtime, _, vlogs = trainer.validate_one_epoch(trainer.epoch)
    vloss = vlogs["base"].get("validation loss")
    print(f"# AR validation ({params.valid_autoreg_steps + 1}-step rollout): "
          f"{vtime:.1f}s, valid loss {vloss}", file=sys.stderr, flush=True)

    # on-chip checkpoint save + restore round trip
    t0 = time.perf_counter()
    trainer.save_checkpoint(params.checkpoint_path)
    trainer._ckpt_mgr.wait()
    t_save = time.perf_counter() - t0
    t0 = time.perf_counter()
    trainer.restore_checkpoint(params.checkpoint_path)
    t_restore = time.perf_counter() - t0
    print(f"# checkpoint save {t_save:.1f}s / restore {t_restore:.1f}s "
          f"(epoch counter now {trainer.epoch})", file=sys.stderr, flush=True)

    # one more step after restore proves the restored state is usable
    t3, _, logs3 = trainer.train_one_epoch()
    print(f"# post-restore epoch: loss {logs3['loss']:.4f}", file=sys.stderr, flush=True)

    vs = 1.0
    prev_path = os.path.join(repo, "BENCH_prev.json")
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            if prev.get("value") and "edim384" in prev.get("metric", ""):
                vs = steps_per_sec / float(prev["value"])
        except Exception:
            pass

    print(json.dumps({
        "metric": f"Trainer-path SFNO flagship train throughput ({cfg_name}, "
                  "shipping Trainer + native loader)",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs, 4),
        "final_train_loss": round(logs3["loss"], 5),
        "valid_loss": None if vloss is None else round(float(vloss), 5),
    }))


def main():
    import jax

    if os.environ.get("BENCH_MODE", "train") == "sht":
        return bench_sht()
    if os.environ.get("BENCH_MODE", "train") == "loader":
        return bench_loader()
    if os.environ.get("BENCH_MODE", "train") == "loader_gate":
        return bench_loader_gate()
    if os.environ.get("BENCH_MODE", "train") == "trainer":
        return bench_trainer()
    if os.environ.get("BENCH_MODE", "train") == "afno":
        return bench_afno()
    if os.environ.get("BENCH_MODE", "train") == "vit":
        return bench_vit()
    if os.environ.get("BENCH_MODE", "train") == "hbm":
        return bench_hbm()
    if os.environ.get("BENCH_MODE", "train") == "rollout":
        rollout = True
    else:
        rollout = False

    tm = os.environ.get("BENCH_TABLES")
    if tm:
        from makani_tpu.ops.sht import set_table_mode
        set_table_mode(tm)
    # transform precision: default mirrors the Trainer's bf16-AMP policy
    # ("default" — 1-pass bf16 dots; qualified convergence-neutral by the
    # round-4 on-chip A/B, see BENCH_NOTES; the reference's own default is
    # TF32-under-AMP). Override with BENCH_PRECISION=mixed/high etc.
    bp = os.environ.get("BENCH_PRECISION") or "default"
    from makani_tpu.ops.sht import set_transform_precision
    from makani_tpu.ops.complex_ops import set_contraction_precision
    set_transform_precision(bp)
    set_contraction_precision(bp)
    os.environ["_BENCH_PREC_TAG"] = bp
    if int(os.environ.get("BENCH_PALLAS", 0)):
        from makani_tpu.ops.complex_ops import enable_pallas_kernels
        enable_pallas_kernels(True)
    # coefficient engine: "stacked" keeps the SpectralConv coefficient stage
    # in m-leading/l-major real planes (no complex64, no XLA relayouts
    # between the Legendre and dhconv dots); "pallas" additionally runs the
    # multi-pass VMEM-accumulating kernels (measured slower than XLA's native
    # dots at flagship shapes — see BENCH_NOTES round 3)
    eng = os.environ.get("BENCH_ENGINE")
    if eng:
        from makani_tpu.ops.sht import set_coeff_engine
        set_coeff_engine(eng)
        os.environ["_BENCH_PREC_TAG"] = f"{bp}/{eng}"

    if rollout:
        return bench_rollout()

    # flagship first; on single-chip OOM step the width down so the driver
    # always gets a number. The TRUE flagship (edim384, ref:
    # config/sfnonet.yaml:162-173) fits the 16GB chip with bf16 Adam moment
    # buffers (utils/optimizers.scale_by_adam_lowmem halves the ~4.6GB
    # moment state; accuracy pinned in tests + BENCH_NOTES), so it is now
    # the default. Step-downs fall back to edim320/f32 moments (the round-2
    # headline config).
    import gc

    embed_ladder = [int(os.environ.get("BENCH_EMBED", 384)), 320, 256, 192, 128]
    last_msg = None
    for embed in dict.fromkeys(embed_ladder):
        try:
            return run_train_bench(embed)
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            oom = "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg
            # drop the exception + traceback: its frames keep the failed
            # attempt's params/optimizer buffers alive on the chip
            last_msg = msg[:2000]
            del e
            gc.collect()
            jax.clear_caches()
            gc.collect()
            if oom:
                print(f"# edim {embed} OOM on this chip; stepping down", file=sys.stderr, flush=True)
                continue
            raise RuntimeError(last_msg)
    raise RuntimeError(f"all ladder sizes OOMed; last error: {last_msg}")


def bench_hbm():
    """Achievable HBM bandwidth: loop-carried saxpy (1 read + 1 write per
    element per iteration, donation keeps residency flat). The denominator
    for the step roofline model in BENCH_NOTES — measured, not the
    datasheet number."""
    import jax
    import jax.numpy as jnp

    mb = int(os.environ.get("BENCH_HBM_MB", 1024))
    n_iters = int(os.environ.get("BENCH_ITERS", 50))
    n = mb * 1024 * 1024 // 4

    a = jnp.ones((n,), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def saxpy(a):
        return a * 1.000001 + 1e-7

    a = saxpy(a)
    float(a[0])  # compile + sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        a = saxpy(a)
    float(a[0])
    dt = time.perf_counter() - t0

    gbs = 2 * n * 4 * n_iters / dt / 1e9
    print(json.dumps({
        "metric": f"HBM saxpy bandwidth ({mb} MB working set)",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": 1.0,
    }))


def bench_rollout():
    """Autoregressive inference throughput (the serving path): jitted
    forward step chained through its own prediction, flagship SFNO config,
    bf16. Reported as rollout steps/s/chip."""
    import jax
    import jax.numpy as jnp
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    nlat = int(os.environ.get("BENCH_NLAT", 721))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 73))
    embed = int(os.environ.get("BENCH_EMBED", 384))
    layers = int(os.environ.get("BENCH_LAYERS", 8))
    n_iters = int(os.environ.get("BENCH_ITERS", 20))
    batch = int(os.environ.get("BENCH_BATCH", 1))  # ensemble serving

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(nlat, nlon), out_shape=(nlat, nlon), scale_factor=3,
        inp_chans=chans, out_chans=chans, embed_dim=embed, num_layers=layers,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, mlp_ratio=2.0, activation_function="gelu",
        hard_thresholding_fraction=1.0, big_skip=True, checkpointing=0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, chans, nlat, nlon).astype(np.float32)).astype(jnp.bfloat16)

    params = jax.jit(lambda k, v: model.init(k, v))(jax.random.PRNGKey(0), x)

    from makani_tpu.ops import sht as sht_lib

    def fwd(params, x):
        return model.apply(params, x).astype(jnp.bfloat16)

    tables = sht_lib.materialize_tables(fwd, params, x)

    def step(params, x, tables):
        with sht_lib.provided_tables(tables):
            return fwd(params, x)

    step = jax.jit(step, donate_argnums=(1,))

    t_c = time.perf_counter()
    x1 = step(params, x, tables)
    np.asarray(jax.device_get(x1[0, 0, 0, :2]))
    print(f"# rollout step compiled+ran in {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)

    xs = x1
    t0 = time.perf_counter()
    for _ in range(n_iters):
        xs = step(params, xs, tables)
    np.asarray(jax.device_get(xs[0, 0, 0, :2]))
    dt = time.perf_counter() - t0

    tag = f" batch{batch}" if batch > 1 else ""
    print(json.dumps({
        "metric": f"SFNO-{chans}ch {nlat}x{nlon} edim{embed} L{layers} bf16 "
                  f"autoregressive rollout{tag}",
        "value": round(batch * n_iters / dt, 4),
        "unit": "member-steps/sec/chip",
        "vs_baseline": 1.0,
    }))


def bench_vit():
    """ViT training throughput (the reference's ViT family at a
    FourCastNet-style staging: 20ch, 720x1440, patch 8x8) — completes the
    model-zoo perf story alongside SFNO and AFNO."""
    import jax
    import jax.numpy as jnp
    import optax
    from makani_tpu.models.networks.vit import VisionTransformer

    nlat = int(os.environ.get("BENCH_NLAT", 720))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 20))
    embed = int(os.environ.get("BENCH_EMBED", 768))
    layers = int(os.environ.get("BENCH_LAYERS", 12))
    n_iters = int(os.environ.get("BENCH_ITERS", 10))

    # attention key-block sweep knob (verdict r4 #7)
    blk = os.environ.get("BENCH_BLOCK")
    if blk:
        from makani_tpu.models.common.attention import set_attention_block_size
        set_attention_block_size(int(blk))

    model = VisionTransformer(
        inp_shape=(nlat, nlon), patch_size=(8, 8), inp_chans=chans,
        out_chans=chans, embed_dim=embed, depth=layers, num_heads=8)

    tx = optax.adam(1e-3)

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x).astype(jnp.float32)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, chans, nlat, nlon).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randn(1, chans, nlat, nlon).astype(np.float32))

    params = jax.jit(lambda k: model.init(k, x)["params"])(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    step = jax.jit(train_step, donate_argnums=(0, 1))

    t_c = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    print(f"# vit step compiled+ran in {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = n_iters / dt

    # analytic matmul-flops accounting (the axon backend cannot always serve
    # cost_analysis): per layer fwd = 12*N*C^2 dense (qkv 3, proj 1, mlp 8)
    # + 4*N^2*C attention (qk^T + pv); train ~= 3x fwd. MFU against the
    # chip's bf16 peak quantifies the attention ceiling (verdict r4 #7).
    N = (nlat // 8) * (nlon // 8)
    dense_f = 2.0 * 12 * N * embed * embed * layers
    attn_f = 4.0 * N * N * embed * layers
    train_f = 3.0 * (dense_f + attn_f)
    peak = float(os.environ.get("BENCH_PEAK_TFS", 197)) * 1e12  # v5e bf16
    mfu = steps_per_sec * train_f / peak
    print(f"# flops/step ~{train_f/1e12:.2f} TF (attention share "
          f"{100*3*attn_f/train_f:.0f}%), MFU {100*mfu:.1f}% of {peak/1e12:.0f} TF/s, "
          f"attention block={os.environ.get('BENCH_BLOCK', 1024)}",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"ViT-{chans}ch {nlat}x{nlon} edim{embed} L{layers} bf16 train "
                  f"throughput (block{os.environ.get('BENCH_BLOCK', 1024)})",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": 1.0,
        "flops_per_step": train_f,
        "mfu_pct": round(100 * mfu, 2),
    }))


def bench_afno():
    """AFNO FourCastNet-style training throughput (BASELINE staged config:
    20ch, 721x1440 -> pad to patch-divisible 720x1440, patch 8x8)."""
    import jax
    import jax.numpy as jnp
    import optax
    from makani_tpu.models.networks.afnonet_v2 import AdaptiveFourierNeuralOperatorNet

    nlat = int(os.environ.get("BENCH_NLAT", 720))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 20))
    embed = int(os.environ.get("BENCH_EMBED", 768))
    layers = int(os.environ.get("BENCH_LAYERS", 12))
    n_iters = int(os.environ.get("BENCH_ITERS", 10))

    model = AdaptiveFourierNeuralOperatorNet(
        inp_shape=(nlat, nlon), patch_size=(8, 8), inp_chans=chans,
        out_chans=chans, embed_dim=embed, num_layers=layers, num_blocks=8)

    tx = optax.adam(1e-3)

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x).astype(jnp.float32)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, chans, nlat, nlon).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randn(1, chans, nlat, nlon).astype(np.float32))

    params = jax.jit(lambda k: model.init(k, x)["params"])(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    step = jax.jit(train_step, donate_argnums=(0, 1))

    t_c = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    print(f"# afno step compiled+ran in {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"AFNO-{chans}ch {nlat}x{nlon} edim{embed} L{layers} bf16 train throughput",
        "value": round(n_iters / dt, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": 1.0,
    }))


def run_train_bench(embed):
    import jax
    import jax.numpy as jnp
    import optax
    from makani_tpu.models.networks import SphericalFourierNeuralOperatorNet

    nlat = int(os.environ.get("BENCH_NLAT", 721))
    nlon = int(os.environ.get("BENCH_NLON", 1440))
    chans = int(os.environ.get("BENCH_CHANS", 73))
    layers = int(os.environ.get("BENCH_LAYERS", 8))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    n_iters = int(os.environ.get("BENCH_ITERS", 10))
    checkpointing = int(os.environ.get("BENCH_CKPT", 2))
    scan_layers = bool(int(os.environ.get("BENCH_SCAN", 0)))

    model = SphericalFourierNeuralOperatorNet(
        inp_shape=(nlat, nlon), out_shape=(nlat, nlon), scale_factor=3,
        inp_chans=chans, out_chans=chans, embed_dim=embed, num_layers=layers,
        operator_type="dhconv", normalization_layer="instance_norm",
        use_mlp=True, mlp_ratio=2.0, activation_function="gelu",
        hard_thresholding_fraction=1.0, big_skip=True,
        checkpointing=checkpointing, scan_layers=scan_layers,
    )

    # bf16 moment buffers by default at the edim384 width (the memory lever
    # that makes the canonical flagship fit 16GB); BENCH_MOMENT_DTYPE
    # overrides either way
    moment_dtype = os.environ.get(
        "BENCH_MOMENT_DTYPE", "bfloat16" if embed >= 384 else "float32")
    if moment_dtype == "float32":
        tx = optax.adam(1e-3)
    else:
        from makani_tpu.utils.optimizers import scale_by_adam_lowmem
        tx = optax.chain(
            scale_by_adam_lowmem(b1=0.9, b2=0.999, eps=1e-8,
                                 moment_dtype=jnp.bfloat16),
            optax.scale(-1e-3))
    # NOTE: no gradient clipping — the reference flagship runs plain Adam(W)
    # (optimizer_max_grad_norm only feeds FusedLAMB, ref: makani/utils/
    # trainer.py:452-465, config/sfnonet.yaml:116-119); a global-norm clip
    # costs an extra full-gradient-tree read per step

    def init_fn(key, x):
        variables = model.init(key, x)
        params = variables["params"]
        return params, tx.init(params)

    # BENCH_NFUTURE>0: multistep AR training (BASELINE config 5,
    # multistep_count = n_future+1; ref: stepper.py:84-121) — unroll the
    # model through its own prediction, target = channel-concat of steps.
    # Activation liveness multiplies by n_future+1; see BENCH_NOTES for the
    # OOM boundary and the remat (BENCH_CKPT) level that rescues it.
    n_future = int(os.environ.get("BENCH_NFUTURE", 0))

    # BENCH_FUSED=1: the Pallas fused Adam+dither update (ops/pallas_adam)
    # in place of the optax update/apply chain — bit-equivalent math, one
    # streaming kernel at the 20 B/element HBM floor
    fused = bool(int(os.environ.get("BENCH_FUSED", 0)))

    # BENCH_NORM=bf16: one-pass bf16 norm statistics (f32 accumulation only)
    if os.environ.get("BENCH_NORM"):
        from makani_tpu.models.common.layers import set_norm_stats_mode
        set_norm_stats_mode(os.environ["BENCH_NORM"])
        os.environ["_BENCH_PREC_TAG"] = \
            os.environ.get("_BENCH_PREC_TAG", "high") + f"/n:{os.environ['BENCH_NORM']}"

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            preds = []
            inpt = x
            for _ in range(n_future + 1):
                pred = model.apply({"params": p}, inpt).astype(jnp.float32)
                preds.append(pred)
                inpt = pred.astype(x.dtype)
            out = preds[0] if n_future == 0 else jnp.concatenate(preds, axis=1)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if fused:
            from makani_tpu.ops.pallas_adam import fused_adam_apply
            # the optax chain applies scale(-lr) after adam; the fused kernel
            # takes +lr and subtracts internally
            params, new_adam = fused_adam_apply(
                params, grads, opt_state[0], 1e-3, b1=0.9, b2=0.999,
                eps=1e-8, stochastic_rounding=moment_dtype != "float32",
                seed=1234)
            return params, (new_adam,) + tuple(opt_state[1:]), loss
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, chans, nlat, nlon).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.randn(batch, chans * (n_future + 1), nlat, nlon).astype(np.float32))

    key = jax.random.PRNGKey(0)
    t_start = time.perf_counter()
    params, opt_state = jax.jit(init_fn)(key, x)
    jax.block_until_ready(params)
    print(f"# init compiled+ran in {time.perf_counter()-t_start:.1f}s", file=sys.stderr, flush=True)

    # ablation modes: BENCH_ABLATE=fwd (inference step) | fwdbwd (no optimizer)
    ablate = os.environ.get("BENCH_ABLATE", "")
    if ablate == "fwd":
        def train_step(params, opt_state, x, y):
            pred = model.apply({"params": params}, x).astype(jnp.float32)
            return params, opt_state, jnp.mean((pred - y) ** 2)
    elif ablate == "fwdbwd":
        def train_step(params, opt_state, x, y):
            def loss_fn(p):
                pred = model.apply({"params": p}, x).astype(jnp.float32)
                return jnp.mean((pred - y) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            # fold grads into params so nothing is dead-code-eliminated
            params = jax.tree.map(lambda p, g: p - 0.0 * g, params, grads)
            return params, opt_state, loss
    # hoist the in-graph Legendre/DFT table scans out of the step (same as
    # the Trainer): compute each distinct table once, pass the dict as an
    # ARGUMENT (closed-over arrays would be embedded as HLO constants).
    # Saves ~30 ms/step at edim320 (the lmax-step lax.scan otherwise reruns
    # inside every step).
    from makani_tpu.ops import sht as sht_lib

    tables = sht_lib.materialize_tables(train_step, params, opt_state, x, y)

    def step_with_tables(params, opt_state, x, y, tables):
        with sht_lib.provided_tables(tables):
            return train_step(params, opt_state, x, y)

    # AUTO layouts: let XLA pick the parameter/optimizer-state memory layouts
    # the matmuls want (the dhconv weights otherwise get relaid out every
    # step: ~27 ms at edim320). Donated + fed back each step, the state stays
    # in the chosen layout; the one-time relayout happens at the first call.
    if int(os.environ.get("BENCH_AUTO_LAYOUT", 1)):
        # AUTO layouts (utils/layouts.py): XLA picks the layouts the matmuls
        # want; the state is materialized in them once (leaf-by-leaf: a
        # whole-tree device_put would double the 4.8GB param+optimizer
        # residency and OOM the 16GB chip), then donation keeps it there
        from makani_tpu.utils.layouts import compile_with_auto_layouts, reput_tree

        compiled, in_fmts = compile_with_auto_layouts(
            step_with_tables, (params, opt_state, x, y, tables), donate_argnums=(0, 1))
        params, opt_state, x, y, tables = (
            reput_tree(a, f) for a, f in zip((params, opt_state, x, y, tables), in_fmts))
        step = lambda params, opt_state, x, y: compiled(params, opt_state, x, y, tables)
    else:
        step_jit = jax.jit(step_with_tables, donate_argnums=(0, 1))
        step = lambda params, opt_state, x, y: step_jit(params, opt_state, x, y, tables)

    # warmup + compile (float() materializes on host: block_until_ready
    # does not truly synchronize on some remote backends)
    t_c = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    print(f"# train step compiled+ran in {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    if os.environ.get("BENCH_PROFILE"):
        # device-op trace of a few steps (xplane + trace.json under the dir)
        with jax.profiler.trace(os.environ["BENCH_PROFILE"]):
            for _ in range(2):
                params, opt_state, loss = step(params, opt_state, x, y)
            float(loss)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = n_iters / dt

    # per-step model FLOPs (XLA client-side cost analysis) so throughput is
    # comparable across config changes (edim320 -> edim384): when the prev
    # record is a different config, vs_baseline is the SUSTAINED-FLOPS ratio
    # (steps/s x flops/step), not raw steps/s
    flops_per_step = None
    try:
        ca = jax.jit(step_with_tables, donate_argnums=(0, 1)).lower(
            params, opt_state, x, y, tables).cost_analysis()
        if ca and ca.get("flops"):
            flops_per_step = float(ca["flops"])
    except Exception as e:
        print(f"# cost analysis unavailable: {e}", file=sys.stderr, flush=True)
    if not flops_per_step and (nlat, nlon, chans, layers, batch) == (721, 1440, 73, 8, 1):
        # client-side XLA cost analysis of the identical step on the CPU
        # backend (the axon remote backend cannot always serve it)
        flops_per_step = {320: 13.04e12, 384: 17.75e12}.get(embed)

    prec_tag = os.environ.get("_BENCH_PREC_TAG", "high")
    if moment_dtype != "float32":
        prec_tag += f"/m:{moment_dtype}"
    ms_tag = f" multistep{n_future + 1}" if n_future else ""
    metric = (f"SFNO-{chans}ch {nlat}x{nlon} edim{embed} L{layers} "
              f"bf16/{prec_tag}{ms_tag} train throughput")

    vs_baseline = 1.0
    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_prev.json")
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            if prev.get("value"):
                same_cfg = f"edim{embed}" in prev.get("metric", metric)
                if same_cfg:
                    vs_baseline = steps_per_sec / float(prev["value"])
                elif flops_per_step and prev.get("flops_per_step"):
                    vs_baseline = (steps_per_sec * flops_per_step) / (
                        float(prev["value"]) * float(prev["flops_per_step"]))
                else:
                    print("# prev record is a different config without flops; "
                          "vs_baseline=1.0", file=sys.stderr, flush=True)
        except Exception:
            pass

    out = {
        "metric": metric,
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }
    if flops_per_step:
        out["flops_per_step"] = flops_per_step
    print(json.dumps(out))


if __name__ == "__main__":
    main()
