"""Training engine.

TPU-native re-design of ref: makani/utils/trainer.py:288-1240. The reference's
runtime machinery maps onto JAX as follows:

  - CUDA-graph capture (trainer.py:84-152)      -> jax.jit (whole train step
    is one compiled program; static shapes by construction)
  - AMP autocast + GradScaler (312-326,511-512) -> bf16 compute dtype on the
    batch (TPU-native; no loss scaling needed), transforms force f32
  - DDP + gradient hooks (514-535)              -> batch sharded over the
    "data" mesh axis under GSPMD; the summed loss is divided by the data-axis
    size so gradient magnitudes match the reference's MEAN-over-data semantics
  - torch.compile / jit-script (63-81)          -> jax.jit
  - per-epoch checkpoint + best checkpoint      -> orbax (flexible format)
"""

import logging
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.data import get_dataloader, init_distributed_io
from makani_tpu.models import model_registry
from makani_tpu.parallel import comm
from makani_tpu.utils import checkpoint as ckpt_lib
from makani_tpu.utils.features import get_auxiliary_channels
from makani_tpu.utils.losses import LossHandler
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.optimizers import LRScheduler, build_optimizer


def augment_batch(inp, tar, zen_inp, zen_tar, rng, do_roll, noise_std):
    """Train-time augmentation on device: random longitude roll applied
    consistently to inputs/targets/zenith, plus gaussian input noise
    (ref: makani/utils/dataloaders/data_loader_dali_2d.py:300-320).
    Shifts are drawn PER SAMPLE, matching the reference's per-sample
    `fn.random.uniform` (data_loader_dali_2d.py:79-88) — one shift for
    the whole batch would shrink augmentation diversity at batch>1."""
    roll_rng, noise_rng = jax.random.split(rng)
    if do_roll:
        shifts = jax.random.randint(roll_rng, (inp.shape[0],), 0, inp.shape[-1])
        roll = lambda t: None if t is None else jax.vmap(
            lambda x, s: jnp.roll(x, s, axis=-1))(t, shifts)
        inp, tar = roll(inp), roll(tar)
        zen_inp, zen_tar = roll(zen_inp), roll(zen_tar)
    if noise_std > 0.0:
        inp = inp + noise_std * jax.random.normal(noise_rng, inp.shape, inp.dtype)
    return inp, tar, zen_inp, zen_tar

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, params, world_rank=0, job_type="train"):
        self.params = params
        self.world_rank = world_rank
        self.data_parallel_size = max(comm.get_size("data"), 1)
        self.data_parallel_rank = comm.get_rank("data")
        self.log_to_screen = params.get("log_to_screen", False)

        self.mesh = comm.get_mesh()

        # dataloaders (ref: trainer.py:375-393)
        params = init_distributed_io(params)
        self.train_dataloader, self.train_dataset = get_dataloader(
            params, params.train_data_path, train=True)
        self.valid_dataloader, self.valid_dataset = get_dataloader(
            params, params.valid_data_path, train=False)

        # channel bookkeeping — the single place params are updated
        params = self._update_parameters(params)
        self.params = params

        # experiment logging (wandb when available, JSONL fallback;
        # ref: trainer.py:328-373)
        self.wandb = None
        if params.get("log_to_wandb", False):
            from makani_tpu.utils import wandb_compat
            self.wandb = wandb_compat
            self.wandb.init(
                dir=params.get("wandb_dir", None) or params.get("experiment_dir", "."),
                config=params,
                name=params.get("wandb_name", None),
                group=params.get("wandb_group", None),
                project=params.get("wandb_project", None),
                entity=params.get("wandb_entity", None),
                resume=params.get("resuming", False),
            )

        # save out a self-contained inference package (ref: trainer.py:401-405)
        if (self.world_rank == 0) and params.get("experiment_dir", None) \
                and job_type == "train":
            from makani_tpu.models.model_package import save_model_package
            save_model_package(params)

        # model
        self.model = model_registry.get_model(params)
        self.preprocessor = self.model.preprocessor

        # loss + metrics
        mult, clim = self._get_time_stats()
        self.metrics = MetricsHandler(params, mult, clim)
        self.loss_obj = LossHandler(params)

        # amp
        self.amp_dtype = None
        amp_mode = params.get("amp_mode", "none")
        if amp_mode in ("bf16", "fp16"):
            # fp16 maps to bf16 on TPU (native, no grad scaler needed)
            self.amp_dtype = jnp.bfloat16

        # spectral matmul precision. Default under bf16 AMP is "default"
        # (1-pass bf16 dots everywhere): the round-4 on-chip training A/B
        # (scripts/convergence_probe.py, BENCH_NOTES round 4) measured it
        # convergence-neutral vs "high"/"mixed" (final-loss ratio 1.0003,
        # loss-curve max rel diff 6e-4, rollout-ACC deltas at noise level —
        # the AMP activation rounding dominates all three modes' deviation
        # from f32, model-level ~1.5e-2) while being 18% faster at the
        # flagship (4.07 vs 3.45 steps/s). This parallels the reference's
        # own TF32-under-AMP default (ref: makani/train.py:109-110).
        # Without AMP the default stays "high" (~16-bit operands, tighter
        # than TF32); "highest" = strict f32; set transform_precision to
        # override either way.
        tp = params.get("transform_precision", None)
        if tp is None:
            tp = "default" if self.amp_dtype is not None else "high"
        from makani_tpu.ops.sht import set_transform_precision
        from makani_tpu.ops.complex_ops import set_contraction_precision
        set_transform_precision(tp)
        set_contraction_precision(tp)
        # surface the resolved numerics so AMP configs notice the
        # precision-mode change (ADVICE r2): the default is AMP-dependent
        logger.info(
            "transform/contraction precision: %r (amp=%s%s)", tp,
            amp_mode, "" if params.get("transform_precision") is not None
            else ", AMP-dependent default")

        # coefficient engine: how SpectralConv's coefficient stage executes —
        # "xla" (complex einsums), "stacked" (m-leading/l-major real planes),
        # "pallas" (stacked + multi-pass VMEM-accumulating kernels). All
        # numerically interchangeable (tests/test_stacked_engine.py); the
        # non-"xla" engines auto-disable under model-parallel SPMD where a
        # pallas custom call cannot be partitioned.
        eng = params.get("coefficient_engine", None)
        if eng is not None:
            from makani_tpu.ops.sht import set_coeff_engine
            set_coeff_engine(eng)
            logger.info("coefficient engine: %r", eng)

        # NaN/Inf trapping (ref: --enable_grad_anomaly_detection ->
        # torch.autograd.set_detect_anomaly, makani/train.py:113-114). The
        # jit-native equivalent re-runs the offending op un-jitted and raises
        # FloatingPointError at the first non-finite value.
        if params.get("enable_grad_anomaly_detection", False):
            jax.config.update("jax_debug_nans", True)

        # optimizer + scheduler
        self.optimizer = build_optimizer(params)
        self.scheduler = LRScheduler(params)

        # init model + optimizer state (jitted: eager mode unavailable on
        # some TPU backends). Shapes are the GLOBAL crop shape: under the
        # single-controller GSPMD design every jitted program sees global
        # logical arrays (img_local_* only governs per-process host IO).
        n_pred_chans = len(params.in_channels)
        # init traces the full forward; running it under the AMP dtype
        # halves the init program's transient activation peak at flagship
        # scale (param VALUES are initializer-drawn, input-independent)
        init_dtype = self.amp_dtype or jnp.float32
        init_inp = jnp.zeros((1, (params.n_history + 1) * n_pred_chans,
                              params.img_crop_shape_x, params.img_crop_shape_y), init_dtype)
        init_zen = None
        if params.get("add_zenith", False):
            init_zen = jnp.zeros((1, params.n_history + 1, 1,
                                  params.img_crop_shape_x, params.img_crop_shape_y), jnp.float32)

        def init_fn(key):
            return self.model.init(key, init_inp, unpredicted_inp=init_zen,
                                   deterministic=True)

        key = jax.random.PRNGKey(params.get("global_seed", 333))
        variables = jax.jit(init_fn)(key)
        self.model_params = variables["params"]
        self.opt_state = jax.jit(self.optimizer.init)(self.model_params)

        # barrier: on fully-async remote backends (axon relay) a later
        # transfer with NO data dependency (the first training batch) can
        # race the init forward at its device-memory peak and OOM; fetching
        # one element forces the init/opt-init programs to completion.
        # block_until_ready alone does not truly synchronize there.
        np.asarray(min(jax.tree.leaves(self.model_params), key=lambda l: l.size))
        np.asarray(min(jax.tree.leaves(self.opt_state),
                       key=lambda l: getattr(l, "size", 1 << 62)))

        # warm the host->device transfer path: the FIRST transfer of a
        # process pays a long one-time relay warmup (~60 s measured; paid by
        # ANY size — a 4 MB probe measured 52.9 s, scripts/transfer_diag.py)
        # and spuriously RESOURCE_EXHAUSTs when it is the real batch put
        # racing the data-loader threads. Keep the warm SMALL: a batch-scale
        # (268 MB) warm was round-5's prime suspect for poisoning the relay
        # staging path — with it, every subsequent put down to 4 MB chunks
        # failed for minutes; without it (MAKANI_NO_WARM=1) the same
        # lifecycle passed every probe (runs/r5_transfer_diag.log).
        if jax.default_backend() not in ("cpu",) \
                and not int(os.environ.get("MAKANI_NO_WARM", 0)):
            try:
                warm = jnp.asarray(np.zeros((1, 1024, 1024), np.float32))
                float(warm.ravel()[0])
                del warm
            except Exception as e:  # never block construction on the warmup
                logger.warning("transfer-path warmup failed: %s", str(e)[:120])

        # background transfer KEEPALIVE (remote relay backends): the relay
        # connection idles out after ~15 s without traffic, and the next
        # host->device put after an idle gap fails with RESOURCE_EXHAUSTED
        # and poisons the connection for minutes (round-5 bracketing:
        # every failed drive had a >=15 s idle window before the put; the
        # diagnostic that never idled passed every probe). A tiny
        # materialized put every transfer_keepalive_s seconds keeps the
        # path hot across loader spinup, step compiles (2.5-12 min!) and
        # epoch boundaries. Paused while a real transfer is in flight.
        ka = float(params.get("transfer_keepalive_s", 5) or 0)
        self._ka_busy = None
        if jax.default_backend() not in ("cpu",) and ka > 0:
            import threading
            self._ka_stop = threading.Event()
            self._ka_busy = threading.Event()

            def _keepalive():
                buf = np.zeros((256,), np.float32)  # 1 KB
                while not self._ka_stop.wait(ka):
                    if self._ka_busy.is_set():
                        continue
                    try:
                        a = jnp.asarray(buf)
                        float(a[0])
                        del a
                    except Exception:
                        pass  # never let the keepalive kill training

            self._ka_thread = threading.Thread(
                target=_keepalive, daemon=True, name="transfer-keepalive")
            self._ka_thread.start()

        # shard parameters + optimizer state over the model-parallel axes
        # (replaces the reference's is_shared_mp/sharded_dims_mp protocol +
        # gradient hooks, ref: makani/mpu/mappings.py:30-174). Any
        # multi-device mesh needs the placement — under PURE data
        # parallelism the rules resolve to replication, but the params must
        # still live on the full mesh or jit rejects the mixed-device args.
        if comm.get_world_size() > 1:
            from makani_tpu.parallel.partitioning import (
                get_opt_state_shardings, get_param_shardings, shard_tree)
            pshard = get_param_shardings(self.model_params, self.mesh)
            self.model_params = shard_tree(self.model_params, pshard)
            oshard = get_opt_state_shardings(self.opt_state, self.model_params, self.mesh)
            self.opt_state = shard_tree(self.opt_state, oshard)
        self.dropout_key = jax.random.PRNGKey(params.get("global_seed", 333) + 1)

        # counters
        self.iters = 0
        self.epoch = 0
        self.startEpoch = 0
        self.best_valid_loss = 1.0e6

        # compile steps
        self._build_steps()

        self._log_memory("after model and optimizer init")

        # restore checkpoint for resume/finetune (ref: trainer.py:586-608)
        if params.get("resuming", False):
            self.restore_checkpoint(params.checkpoint_path)
        elif params.get("finetune", False) and params.get("pretrained_checkpoint_path", None):
            self.restore_checkpoint(params.pretrained_checkpoint_path,
                                    load_optimizer=False, load_counters=False)

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.model_params))
        if self.log_to_screen:
            logger.info(f"number of trainable model parameters: {n_params}")
        self.n_model_params = n_params

    # ------------------------------------------------------------------
    # parameter / stats bookkeeping

    def _update_parameters(self, params):
        """Channel math (ref: trainer.py:185-274)."""
        ds = self.valid_dataset
        params.N_in_channels = len(ds.in_channels)
        params.N_out_channels = len(ds.out_channels)

        params.img_shape_x = ds.img_shape_x
        params.img_shape_y = ds.img_shape_y
        params.img_crop_shape_x = ds.img_crop_shape_x
        params.img_crop_shape_y = ds.img_crop_shape_y
        params.img_crop_offset_x = ds.img_crop_offset_x
        params.img_crop_offset_y = ds.img_crop_offset_y
        params.img_local_shape_x = ds.img_local_shape_x
        params.img_local_shape_y = ds.img_local_shape_y
        params.img_local_offset_x = ds.img_local_offset_x
        params.img_local_offset_y = ds.img_local_offset_y

        params["N_in_predicted_channels"] = params.N_in_channels

        if not hasattr(params, "add_zenith"):
            params["add_zenith"] = False
        if params.add_zenith:
            params.N_in_channels += 1

        if params.n_history >= 1:
            params.N_in_channels = (params.n_history + 1) * params.N_in_channels
            params.N_in_predicted_channels *= params.n_history + 1

        if params.get("add_grid", False):
            n_grid_chan = 2
            if (params.get("gridtype") == "sinusoidal") and hasattr(params, "grid_num_frequencies"):
                n_grid_chan *= params.grid_num_frequencies
            params.N_in_channels += n_grid_chan

        if params.get("add_orography", False):
            params.N_in_channels += 1

        if params.get("add_landmask", False):
            params.N_in_channels += 2

        params["aux_channel_names"] = get_auxiliary_channels(**params.to_dict())
        params.N_target_channels = (params.n_future + 1) * params.N_out_channels

        for key, default in [
            ("history_normalization_mode", "none"), ("num_visualization_workers", 1),
            ("log_video", 0), ("log_weights_and_grads", 0), ("skip_validation", False),
            ("load_checkpoint", "legacy"), ("save_checkpoint", "legacy"),
            ("load_optimizer", True), ("load_scheduler", True), ("load_counters", True),
            ("print_timings_frequency", -1),
        ]:
            if not hasattr(params, key):
                params[key] = default

        return params

    def _get_time_stats(self):
        """Climatology + denormalization scale (ref: trainer.py:154-183)."""
        _, out_scale = self.valid_dataloader.get_output_normalization()
        mult = np.asarray(out_scale)[0, :, 0, 0]

        if self.params.get("enable_synthetic_data", False):
            clim = np.zeros(
                (self.params.N_out_channels, self.params.img_crop_shape_x,
                 self.params.img_crop_shape_y), dtype=np.float32)
        else:
            in_bias, in_scale = self.valid_dataloader.get_input_normalization()
            in_bias = in_bias[0]
            in_scale = in_scale[0]
            start_x = self.params.img_crop_offset_x
            end_x = start_x + self.params.img_crop_shape_x
            start_y = self.params.img_crop_offset_y
            end_y = start_y + self.params.img_crop_shape_y
            time_means = np.load(self.params.time_means_path)[0, self.params.out_channels, start_x:end_x, start_y:end_y]
            clim = ((time_means - in_bias) / in_scale).astype(np.float32)

        return mult, clim

    # ------------------------------------------------------------------
    # compiled steps

    def _build_steps(self):
        model = self.model
        prep = self.preprocessor
        loss_obj = self.loss_obj
        optimizer = self.optimizer
        metrics = self.metrics
        amp_dtype = self.amp_dtype
        data_size = float(self.data_parallel_size)
        valid_autoreg_steps = self.params.valid_autoreg_steps
        out_chans = self.params.N_out_channels

        def prepare(inp, tar):
            if amp_dtype is not None:
                inp = inp.astype(amp_dtype)
            return inp, tar

        do_roll = bool(self.params.get("roll", False))
        noise_std = float(self.params.get("noise_std", 0.0)) if self.params.get("add_noise", False) else 0.0

        def augment(inp, tar, zen_inp, zen_tar, rng):
            return augment_batch(inp, tar, zen_inp, zen_tar, rng, do_roll, noise_std)

        # fused Pallas optimizer stage (ops/pallas_adam): one kernel streams
        # grad+state at the 20 B/element traffic floor, bit-equivalent to the
        # optax chain below. Single-device only (pallas custom calls cannot
        # be partitioned); any ineligible config silently keeps the chain.
        from makani_tpu.utils.optimizers import fused_adam_settings
        fused_kw = fused_adam_settings(self.params) \
            if comm.get_world_size() == 1 else None
        if fused_kw is not None:
            logger.info("optimizer: fused pallas Adam update (%s)", fused_kw)

        def apply_updates(model_params, opt_state, grads, lr):
            if fused_kw is not None:
                from makani_tpu.ops.pallas_adam import fused_adam_apply
                new_params, new_adam = fused_adam_apply(
                    model_params, grads, opt_state[0], lr, **fused_kw)
                return new_params, (new_adam,) + tuple(opt_state[1:])
            updates, new_opt_state = optimizer.update(grads, opt_state, model_params)
            new_params = jax.tree.map(
                lambda p, u: (p - lr * u.astype(p.dtype)) if u is not None else p,
                model_params, updates)
            return new_params, new_opt_state

        def train_step(model_params, opt_state, inp, tar, zen_inp, zen_tar, lr, rng):
            aug_rng, drop_rng = jax.random.split(rng)
            rng = drop_rng
            if do_roll or noise_std > 0.0:
                inp, tar, zen_inp, zen_tar = augment(inp, tar, zen_inp, zen_tar, aug_rng)
            inp = prep.flatten_history(inp)
            tar = prep.flatten_history(tar)
            inp, tar = prepare(inp, tar)

            def loss_fn(p):
                pred = model.apply(
                    {"params": p}, inp, unpredicted_inp=zen_inp,
                    unpredicted_tar=zen_tar, deterministic=False,
                    rngs={"dropout": rng})
                loss = loss_obj(pred.astype(jnp.float32), tar, inp, training=True)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(model_params)
            # match reference gradient semantics: MEAN over data ranks of
            # local batch-sum losses (ref: mpu/mappings.py:104-172)
            grads = jax.tree.map(lambda g: g / data_size, grads)
            new_params, new_opt_state = apply_updates(
                model_params, opt_state, grads, lr)
            return new_params, new_opt_state, loss / data_size

        def eval_ar_step(model_params, buffers, inpt, uinp, tar, zen_tar, idt):
            """ONE autoregressive validation step with a traced rollout index:
            the host loops over this single compiled program, so program size
            is independent of valid_autoreg_steps (the reference's per-step
            python loop, ref: trainer.py:799-890; an unrolled 20x program
            would not compile at flagship scale)."""
            targ = prep.flatten_history(
                jax.lax.dynamic_slice_in_dim(tar, idt, 1, axis=1))
            pred_inp, _ = prepare(inpt, targ)
            pred = model.apply(
                {"params": model_params}, pred_inp, unpredicted_inp=uinp,
                deterministic=True).astype(jnp.float32)
            loss = loss_obj(pred, targ, inpt, training=False) / data_size
            buffers = metrics.update(buffers, pred, targ, loss, idt)
            uinp = prep.advance_unpredicted_dyn(uinp, zen_tar, idt)
            inpt = prep.append_history(inpt, pred)
            # tiny channel-0 frame pair for optional rollout videos (a few
            # MB; avoids compiling a second full-model rollout program)
            frame = (pred[0, 0], targ[0, 0])
            return buffers, inpt, uinp, frame

        # AUTO layouts are a single-device optimization: under a real mesh,
        # layouts interact with GSPMD sharding and the default convention is
        # kept (the partitioner's collectives expect it)
        auto_ok = bool(self.params.get("enable_auto_layouts", True)) and comm.get_world_size() == 1

        self.train_step = self._with_tables(train_step, donate=(0, 1), auto_layouts=auto_ok)
        self._eval_ar_step = self._with_tables(eval_ar_step, donate=(1, 2, 3))
        self._flatten = jax.jit(prep.flatten_history)

        def eval_step(model_params, buffers, inp, tar, zen_inp, zen_tar,
                      capture_frames=False):
            """Host loop over the single compiled AR step — one compile
            serves any rollout length."""
            inpt = self._flatten(inp)
            uinp = zen_inp
            frames = []
            for idt in range(valid_autoreg_steps + 1):
                buffers, inpt, uinp, frame = self._eval_ar_step(
                    model_params, buffers, inpt, uinp, tar, zen_tar, idt)
                if capture_frames:
                    frames.append(tuple(np.asarray(f) for f in frame))
            if capture_frames:
                return buffers, frames
            return buffers

        self.eval_step = eval_step

        def eval_forward_body(model_params, inp, zen_inp):
            inpt = prep.flatten_history(inp)
            x, _ = prepare(inpt, inpt)
            return model.apply({"params": model_params}, x,
                               unpredicted_inp=zen_inp, deterministic=True).astype(jnp.float32)

        self.eval_forward = self._with_tables(eval_forward_body, donate=())

        def grad_step(model_params, inp, tar, zen_inp, zen_tar):
            """Loss + raw gradients for the weights-and-grads debug dump
            (ref: trainer.py:1222-1240)."""
            inp = prep.flatten_history(inp)
            tar = prep.flatten_history(tar)
            inp, tar = prepare(inp, tar)

            def loss_fn(p):
                pred = model.apply(
                    {"params": p}, inp, unpredicted_inp=zen_inp,
                    unpredicted_tar=zen_tar, deterministic=True)
                return loss_obj(pred.astype(jnp.float32), tar, inp, training=True)

            return jax.value_and_grad(loss_fn)(model_params)

        self._grad_step = self._with_tables(grad_step, donate=())

    def _with_tables(self, body, donate, auto_layouts=False):
        """jit `body` with the in-graph Legendre table scans hoisted out:
        compute each distinct table once (ops/sht.materialize_tables) and
        feed the dict back as a step ARGUMENT (~30 ms/step saved on a v5e;
        closing over the arrays instead would embed them as HLO constants).
        The table dict is shared across all step functions of this engine."""
        from makani_tpu.ops import sht as sht_lib

        if not hasattr(self, "_sht_tables"):
            self._sht_tables = None

        def wrapped(*args):
            with sht_lib.provided_tables(args[-1]):
                return body(*args[:-1])

        jitted = jax.jit(wrapped, donate_argnums=donate)
        cache = {}

        def call(*args):
            if "keys" not in cache:
                # record which tables THIS step fn needs; compute any the
                # shared dict is missing. Each fn is fed only its own subset
                # so its jit cache structure stays stable when other step
                # fns later extend the shared dict (arrays are shared device
                # buffers — no duplication).
                shared = self._sht_tables or {}
                rec = {}
                with sht_lib.recording_tables(rec):
                    with sht_lib.provided_tables(shared):
                        jax.eval_shape(body, *args)
                missing = {k: fn for k, fn in rec.items() if k not in shared}
                if missing:
                    new = jax.jit(lambda: {k: fn() for k, fn in missing.items()})()
                    shared = {**shared, **new}
                self._sht_tables = shared
                cache["keys"] = sorted(set(rec.keys()) & set(shared.keys()))
            tables = {k: self._sht_tables[k] for k in cache["keys"]}
            if not auto_layouts:
                return jitted(*args, tables)
            # AUTO layouts (utils/layouts.py): XLA picks the parameter/
            # optimizer-state layouts its matmuls want; donation feeds
            # them back each step so the relayout happens once. The AOT
            # executable is keyed on the args' shape/dtype/None structure
            # (unlike jax.jit it cannot re-specialize itself), so a shape
            # change compiles a fresh executable instead of crashing.
            from makani_tpu.utils import layouts as layouts_lib

            def signature(tree):
                leaves, treedef = jax.tree_util.tree_flatten(tree)
                return (treedef, tuple(
                    (getattr(l, "shape", None), str(getattr(l, "dtype", type(l))))
                    for l in leaves))

            sig = signature(args)
            if cache.get("sig") != sig:
                full = (*args, tables)
                cache["exec"], cache["fmts"] = layouts_lib.compile_with_auto_layouts(
                    wrapped, full, donate_argnums=donate)
                cache["sig"] = sig
                tables = layouts_lib.reput_tree(tables, cache["fmts"][-1])
                self._sht_tables = {**self._sht_tables, **tables}
            fmts = cache["fmts"]
            args = tuple(layouts_lib.reput_tree(a, f) for a, f in zip(args, fmts[:-1]))
            return cache["exec"](*args, tables)

        # introspection hooks for the multichip dryrun's compile gates
        # (__graft_entry__): the raw jit and the table subset this step feeds
        call._jitted = jitted
        call._tables = lambda: {k: self._sht_tables[k]
                                for k in cache.get("keys", [])}
        return call

    def _device_batch(self, data):
        """Host batch -> global device arrays sharded over the data axis
        (and spatial axes when the loader io-shards across processes).

        Single process: the host array IS the global batch; device_put with a
        NamedSharding scatters it. Multi-process: every process holds only
        its local slice, so the global array is assembled with
        jax.make_array_from_process_local_data (the single-controller analog
        of the reference's rank-local DDP feeding, ref:
        makani/utils/dataloader.py:27-60 + trainer.py:712-797)."""
        if len(data) == 4:
            inp, tar, zen_inp, zen_tar = data
        else:
            inp, tar = data
            zen_inp = zen_tar = None

        io_grid = self.params.get("io_grid", [1, 1, 1])
        spec = P("data", None, None,
                 "h" if io_grid[1] > 1 else None,
                 "w" if io_grid[2] > 1 else None)
        sharding = NamedSharding(self.mesh, spec)

        if jax.process_count() > 1:
            global_batch = int(self.params.batch_size) * self.data_parallel_size

            def put(x):
                if x is None:
                    return None
                x = np.asarray(x)
                gshape = list(x.shape)
                gshape[0] = global_batch
                if io_grid[1] > 1:
                    gshape[-2] = self.params.img_crop_shape_x
                if io_grid[2] > 1:
                    gshape[-1] = self.params.img_crop_shape_y
                return jax.make_array_from_process_local_data(sharding, x, tuple(gshape))
        else:
            def put(x):
                if x is None:
                    return None
                return self._put_with_retry(x, sharding)

        out = (put(inp), put(tar), put(zen_inp), put(zen_tar))
        self._transfer_presettle = False
        self._presettle_slept = False
        return out

    def _put_with_retry(self, x, sharding):
        """device_put with a RESOURCE_EXHAUSTED fallback ladder for remote-
        relay backends (axon): (1) the sharded batched_device_put path fails
        spuriously there while plain transfers succeed — fall back to a
        plain host->device transfer + a jitted identity that reshards on
        device; (2) the relay also releases dead clients' allocations
        LAZILY, so back off and retry before concluding a genuine OOM."""
        if not hasattr(self, "_reshard_fns"):
            self._reshard_fns = {}
        key = (x.shape, str(x.dtype), sharding)
        if key not in self._reshard_fns:
            self._reshard_fns[key] = jax.jit(lambda t: t, out_shardings=sharding)

        # fallback ladder: a full-size transfer from a process holding the
        # flagship training state spuriously fails with RESOURCE_EXHAUSTED
        # on the relay transport while SMALLER transfers keep working —
        # degrade to plain-put + on-device reshard, then to chunked
        # transfers (slices along the widest axis + jitted concat), with
        # short backoffs. A genuine capacity OOM exhausts the ladder.
        # the dominant spurious-failure mode (axon relay): a full-size
        # transfer streamed while the prefetch workers own the host fails,
        # and a failed big transfer poisons the connection for every retry
        # path and size. On remote backends EVERY batch transfer therefore
        # goes through quiesce + the escalating chunked ramp (round-5
        # probes: ramped transfers 4/4, full-size-first ~3/11); the
        # epoch-first one additionally waits out a short settle. Set
        # serialize_transfers: false to restore raw overlapped puts on
        # directly-attached hardware.
        if getattr(self, "_ka_busy", None) is not None:
            self._ka_busy.set()
        try:
            return self._put_with_retry_inner(x, sharding, key)
        finally:
            if getattr(self, "_ka_busy", None) is not None:
                self._ka_busy.clear()

    def _put_with_retry_inner(self, x, sharding, key):
        if jax.default_backend() not in ("cpu",)                 and self.params.get("serialize_transfers", True):
            self._quiesce_loaders()
            # NOTE round-5: the former 15 s "presettle" sleep here is GONE —
            # it was measured 0/2 this round while the no-sleep path passed,
            # consistent with the idle-gap pathology (any >=15 s idle window
            # immediately before a put kills the connection; see
            # _keepalive). transfer_presettle_s restores it if ever needed.
            ps = float(self.params.get("transfer_presettle_s", 0) or 0)
            if ps > 0 and getattr(self, "_transfer_presettle", False) \
                    and not getattr(self, "_presettle_slept", False):
                self._presettle_slept = True
                time.sleep(ps)
            try:
                return self._ramp_put(x, sharding)
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                logger.warning("ramped transfer failed (%s); "
                               "entering degradation ladder", repr(e)[:200])

        plans = [("sharded", None), ("plain", None), ("chunk", 64 << 20),
                 ("chunk", 32 << 20), ("plain", None), ("chunk", 16 << 20),
                 ("chunk", 8 << 20), ("chunk", 8 << 20)]
        for attempt, (mode, max_bytes) in enumerate(plans):
            try:
                if mode == "sharded":
                    return jax.device_put(x, sharding)
                if mode == "plain":
                    return self._reshard_fns[key](jnp.asarray(x))
                return self._chunked_put(x, sharding, max_bytes)
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or attempt == len(plans) - 1:
                    raise
                logger.warning(
                    "batch transfer (%s) hit RESOURCE_EXHAUSTED; quiescing "
                    "loaders and degrading transfer path (attempt %d)",
                    mode, attempt + 1)
                self._quiesce_loaders()
                try:
                    np.asarray(min(jax.tree.leaves(self.model_params),
                                   key=lambda l: l.size))
                except Exception:
                    pass
                time.sleep(5.0 * (attempt + 1))

    def _quiesce_loaders(self):
        for dl in (getattr(self, "train_dataloader", None),
                   getattr(self, "valid_dataloader", None)):
            fn = getattr(dl, "wait_prefetch_idle", None)
            if fn is not None:
                fn()

    def _ramp_put(self, x, sharding):
        """Escalating-size chunked transfer: slices along the widest axis
        sized ~[4, 16, 64, 64, ...] MB, reassembled on device by a jitted
        concatenate — warms the transfer path without ever risking a large
        first message.

        Each chunk is MATERIALIZED (one-element host fetch) before the next
        is dispatched: plain jnp.asarray dispatches are async, so without
        the sync every chunk streams CONCURRENTLY through the relay — and
        concurrent streams are precisely what the relay transport chokes on
        (round-5 diagnosis: serial individually-materialized puts of
        4/64/300 MB pass 100% in every lifecycle stage while the async
        ramp fails even at its 4 MB leading chunk; a failed transfer then
        poisons the connection for every retry size for minutes —
        runs/r5_transfer_diag.log vs r5_trainer_bench2.log)."""
        x = np.asarray(x)
        axis = int(np.argmax(x.shape))
        n = x.shape[axis]
        bytes_per_index = x.nbytes // max(n, 1)
        sizes_mb = [4, 16, 64]
        counts, i = [], 0
        while i < n:
            mb = sizes_mb[min(len(counts), len(sizes_mb) - 1)]
            per = max(1, int((mb << 20) // max(bytes_per_index, 1)))
            counts.append(min(per, n - i))
            i += counts[-1]
        idx = lambda s, c: (slice(None),) * axis + (slice(s, s + c),)
        parts, s = [], 0
        zero = (0,) * x.ndim
        for ci, c in enumerate(counts):
            try:
                part = jnp.asarray(np.ascontiguousarray(x[idx(s, c)]))
                # force this chunk's transfer to COMPLETE before dispatching
                # the next (block_until_ready does not truly sync on axon;
                # a one-element fetch does)
                float(part[zero])
            except Exception as e:
                logger.warning(
                    "ramp chunk %d/%d (%.0f MB at offset %d) failed: %s",
                    ci + 1, len(counts), c * bytes_per_index / 1e6, s,
                    repr(e)[:300])
                raise
            parts.append(part)
            s += c
        key = ("ramp", x.shape, str(x.dtype), sharding, tuple(counts))
        if key not in self._reshard_fns:
            self._reshard_fns[key] = jax.jit(
                lambda *p: jnp.concatenate(p, axis=axis), out_shardings=sharding)
        return self._reshard_fns[key](*parts)

    def _chunked_put(self, x, sharding, max_bytes):
        """Transfer x in <=max_bytes slices along its widest axis and
        reassemble on device with a jitted concatenate."""
        x = np.asarray(x)
        axis = int(np.argmax(x.shape))
        n = x.shape[axis]
        bytes_per_index = x.nbytes // max(n, 1)
        per = max(1, int(max_bytes // max(bytes_per_index, 1)))
        idx = lambda i: (slice(None),) * axis + (slice(i, i + per),)
        # serialized like _ramp_put: materialize each chunk before the next
        # dispatch (concurrent streams are what the relay chokes on)
        zero = (0,) * x.ndim
        parts = []
        for i in range(0, n, per):
            part = jnp.asarray(np.ascontiguousarray(x[idx(i)]))
            float(part[zero])
            parts.append(part)
        key = ("concat", x.shape, str(x.dtype), sharding, axis, per)
        if key not in self._reshard_fns:
            self._reshard_fns[key] = jax.jit(
                lambda *p: jnp.concatenate(p, axis=axis), out_shardings=sharding)
        return self._reshard_fns[key](*parts)

    # ------------------------------------------------------------------
    # training loop

    def train(self):
        if self.log_to_screen:
            logger.info("Starting Training Loop...")

        training_start = time.time()

        self._log_memory("training start")
        dump_every = int(self.params.log_weights_and_grads or 0)

        for epoch in range(self.startEpoch, self.params.max_epochs):
            epoch_start = time.time()
            train_time, train_data_gb, train_logs = self.train_one_epoch()
            self._log_memory(f"epoch {self.epoch} train end")

            if dump_every > 0 and (self.epoch % dump_every == 0) \
                    and getattr(self, "_dump_batch", None) is not None:
                self.dump_weights_and_grads(self._dump_batch)

            if not self.params.skip_validation:
                valid_time, viz_time, valid_logs = self.validate_one_epoch(epoch)
            else:
                valid_time, viz_time = 0, 0
                valid_logs = {"base": {}, "metrics": {}}

            self.scheduler.epoch_step(valid_logs["base"].get("validation loss"))

            # every process participates (orbax coordinates primary-host
            # writes itself — unlike the reference's rank-0 gate, gating here
            # would deadlock multi-process runs); writes are async so the
            # next epoch overlaps the persist
            if self.params.save_checkpoint != "none":
                best_path = self.params.best_checkpoint_path
                best_saved = ckpt_lib.checkpoint_exists(best_path)
                vloss = valid_logs["base"].get("validation loss", None)
                is_best = (not self.params.skip_validation) and (
                    (not best_saved) or (vloss is not None and vloss <= self.best_valid_loss))
                # update best BEFORE writing so the per-epoch checkpoint's
                # counters carry this epoch's value (resume equivalence)
                if is_best and vloss is not None:
                    self.best_valid_loss = vloss
                self.save_checkpoint(self.params.checkpoint_path)
                if is_best:
                    self.save_checkpoint(best_path)

            epoch_end = time.time()
            timing_logs = {
                "epoch time [s]": epoch_end - epoch_start,
                "training time [s]": train_time,
                "validation time [s]": valid_time,
                "visualization time [s]": viz_time,
                "training step time [ms]": (train_time / max(train_logs["train_steps"], 1)) * 1e3,
                "minimal IO rate [GB/s]": train_data_gb / max(train_time, 1e-9),
            }
            self.log_epoch(train_logs, valid_logs, timing_logs)

        # drain in-flight async checkpoint writes before returning
        if getattr(self, "_ckpt_mgr", None) is not None:
            self._ckpt_mgr.wait()
        ckpt_lib.wait_for_saves()

        if self.log_to_screen:
            logger.info("Total training time is {:.2f} sec".format(time.time() - training_start))

    def train_one_epoch(self):
        self.epoch += 1
        self._transfer_presettle = True
        total_data_bytes = 0
        train_steps = 0
        train_start = time.perf_counter_ns()
        loss = None

        # optional profiler window over the first N steps of the first epoch
        # (ref capability: makani/train_profile.py cudaProfilerStart/Stop windows)
        profile_steps = int(self.params.get("profile_steps", 0) or 0)
        profiling = profile_steps > 0 and self.epoch == 1
        if profiling:
            profile_dir = os.path.join(self.params.get("experiment_dir", "."), "profile")
            jax.profiler.start_trace(profile_dir)

        dump_every = int(self.params.log_weights_and_grads or 0)

        # time spent BLOCKED on the loader (prefetch exhausted): the loud
        # data-plane health signal — per-epoch GB/s alone cannot distinguish
        # "loader feeds the chip" from "chip waits for the loader"
        data_wait_ns = 0

        data_iter = iter(self.train_dataloader)
        while True:
            t_wait = time.perf_counter_ns()
            try:
                data = next(data_iter)
            except StopIteration:
                break
            data_wait_ns += time.perf_counter_ns() - t_wait
            train_steps += 1
            self.iters += 1

            inp, tar, zen_inp, zen_tar = self._device_batch(data)
            total_data_bytes += sum(0 if x is None else x.size * 4 for x in data)
            if dump_every > 0:
                self._dump_batch = (inp, tar, zen_inp, zen_tar)

            lr = jnp.float32(self.scheduler(self.iters))
            rng = jax.random.fold_in(self.dropout_key, self.iters)
            self.model_params, self.opt_state, loss = self.train_step(
                self.model_params, self.opt_state, inp, tar, zen_inp, zen_tar, lr, rng)

            if profiling and train_steps >= profile_steps:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False
                if self.log_to_screen:
                    logger.info(f"profiler trace written to {profile_dir}")

            freq = self.params.print_timings_frequency
            if freq > 0 and (self.iters % freq == 0) and self.log_to_screen:
                jax.block_until_ready(loss)
                running = time.perf_counter_ns() - train_start
                logger.info(f"Average step time after step {self.iters}: {running / float(train_steps) * 1e-6:.1f} ms")
                logger.info(
                    f"Average effective io rate after step {self.iters}: "
                    f"{total_data_bytes * float(comm.get_world_size()) / (float(running) * 1e-9 * 1024**3):.2f} GB/s")
                logger.info(f"Current loss {float(loss)}")

        if profiling:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()

        logs = {"loss": float(jax.device_get(loss)) if loss is not None else float("nan"),
                "train_steps": train_steps}
        self._last_train_loss = logs["loss"]

        train_end = time.perf_counter_ns()
        train_time = (train_end - train_start) * 1e-9
        total_data_gb = (total_data_bytes / 1024**3) * float(comm.get_world_size())

        # loud warning when the data plane cannot feed the chip: >15% of the
        # epoch spent blocked on the loader means steps/s is loader-bound,
        # not compute-bound (the first epoch also pays compile+worker spinup,
        # so only warn from epoch 2). num_data_workers is the lever
        # (flagship gate: BENCH_NOTES round 4).
        data_wait = data_wait_ns * 1e-9
        self._last_data_wait_frac = data_wait / max(train_time, 1e-9)
        if self.epoch > 1 and train_steps > 1 and self._last_data_wait_frac > 0.15:
            have = total_data_bytes / max(data_wait, 1e-9) / 1e9
            need = total_data_bytes / max(train_time, 1e-9) / 1e9
            logger.warning(
                "DATA-PLANE BOTTLENECK: %.0f%% of epoch %d spent waiting on the "
                "dataloader (sustains ~%.2f GB/s under load vs ~%.2f GB/s the "
                "step consumes). Raise num_data_workers (currently %s) or move "
                "the dataset to faster storage / the native loader.",
                100 * self._last_data_wait_frac, self.epoch, have, need,
                self.params.get("num_data_workers"))

        return train_time, total_data_gb, logs

    def validate_one_epoch(self, epoch):
        self._transfer_presettle = True
        buffers = self.metrics.initialize_buffers()
        valid_start = time.time()

        visualize = bool(self.params.log_video) and (epoch % max(self.params.log_video, 1) == 0)

        eval_steps = 0
        for data in self.valid_dataloader:
            eval_steps += 1
            inp, tar, zen_inp, zen_tar = self._device_batch(data)
            if visualize and eval_steps <= 1:
                # render the first sample's one-step prediction vs target
                # (ref: trainer.py:845-866)
                from makani_tpu.utils.visualize import VisualizationWrapper
                if not hasattr(self, "visualizer"):
                    self.visualizer = VisualizationWrapper(
                        self.params, num_workers=self.params.get("num_visualization_workers", 1))
                pred = self.eval_forward(self.model_params, inp, zen_inp)
                targ = self.preprocessor.flatten_history(tar[:, :1])
                self.visualizer.add(f"epoch{epoch}_step{eval_steps}",
                                    np.asarray(pred[0, :2]), np.asarray(targ[0, :2]))
                # rollout animation of channel 0 over the validation horizon
                # (reference capability: rollout videos); frames come out of
                # the same compiled AR step that scores the batch
                buffers, frames = self.eval_step(
                    self.model_params, buffers, inp, tar, zen_inp, zen_tar,
                    capture_frames=True)
                pf = np.stack([f[0] for f in frames])
                tf = np.stack([f[1] for f in frames])
                self.visualizer.add_video(f"epoch{epoch}_rollout_ch0", pf, tf)
                continue
            buffers = self.eval_step(self.model_params, buffers, inp, tar, zen_inp, zen_tar)

        logs = self.metrics.finalize(buffers)

        viz_time = time.perf_counter()
        if visualize and hasattr(self, "visualizer"):
            self.visualizer.finalize()
        viz_time = time.perf_counter() - viz_time

        valid_time = time.time() - valid_start
        return valid_time, viz_time, logs

    # ------------------------------------------------------------------
    # observability

    def _log_memory(self, tag):
        """Device-memory telemetry at phase boundaries (the reference's
        pynvml prints, ref: trainer.py:307-310,614-616). CPU devices report
        no stats; that is silently skipped."""
        if not self.log_to_screen:
            return
        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            stats = None
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**30
            peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            logger.info(
                f"Device memory [{tag}]: {used:.2f} GB in use, "
                f"{peak:.2f} GB peak, {limit:.2f} GB limit")

    def dump_weights_and_grads(self, batch):
        """npz dump of every parameter and its gradient on the given batch
        (ref: trainer.py:1222-1240 per-mp-rank torch.save dumps)."""
        inp, tar, zen_inp, zen_tar = batch
        _, grads = self._grad_step(self.model_params, inp, tar, zen_inp, zen_tar)
        out = {}
        wflat, _ = jax.tree_util.tree_flatten_with_path(self.model_params)
        gflat, _ = jax.tree_util.tree_flatten_with_path(grads)
        for (kp, w), (_, g) in zip(wflat, gflat):
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            out[f"weights/{path}"] = np.asarray(w)
            out[f"grads/{path}"] = np.asarray(g)
        dump_dir = os.path.join(self.params.get("experiment_dir", "."), "weights_and_grads")
        os.makedirs(dump_dir, exist_ok=True)
        fname = os.path.join(
            dump_dir, f"weights_and_grads_epoch{self.epoch}_rank{comm.get_world_rank()}.npz")
        np.savez(fname, **out)
        if self.log_to_screen:
            logger.info(f"weights and grads dumped to {fname}")

    # ------------------------------------------------------------------
    # logging / checkpointing

    def log_epoch(self, train_logs, valid_logs, timing_logs):
        """(ref: trainer.py:892-934)."""
        if self.wandb is not None:
            self.wandb.log({"training loss": train_logs["loss"],
                            "learning rate": self.scheduler(self.iters),
                            **timing_logs}, step=self.epoch)
            self.wandb.log(valid_logs["base"], step=self.epoch)
            metrics = dict(valid_logs["metrics"])
            rollouts = metrics.pop("rollouts", None)
            if rollouts is not None:
                from makani_tpu.utils.wandb_compat import Table
                metrics["rollouts"] = Table(
                    data=rollouts, columns=["metric type", "variable name", "time [h]", "value"])
            self.wandb.log(metrics, step=self.epoch)

        if not self.log_to_screen:
            return
        separator = "-" * 50
        prefix = "    "
        logger.info(separator)
        logger.info(f"Epoch {self.epoch} summary:")
        logger.info("Performance Parameters:")
        logger.info(prefix + "training steps: {}".format(train_logs["train_steps"]))
        logger.info(prefix + "validation steps: {}".format(valid_logs["base"].get("validation steps", 0)))
        for key, val in timing_logs.items():
            logger.info(prefix + key + ": {:.2f}".format(val))

        print_list = ["training loss", "validation loss", "validation L1"] + list(valid_logs["metrics"].keys())
        max_len = max(len(x) for x in print_list)
        logger.info("Metrics:")
        logger.info(prefix + "training loss: {}{}".format(" " * (max_len - 13), train_logs["loss"]))
        if "validation loss" in valid_logs["base"]:
            logger.info(prefix + "validation loss: {}{}".format(" " * (max_len - 15), valid_logs["base"]["validation loss"]))
            logger.info(prefix + "validation L1: {}{}".format(" " * (max_len - 13), valid_logs["base"]["validation L1"]))
        for key in valid_logs["metrics"]:
            value = valid_logs["metrics"][key]
            if np.isscalar(value):
                logger.info(f"{prefix}{key}: {' ' * (max_len - len(key))}{value}")
        logger.info(separator)

    def save_checkpoint(self, checkpoint_path, checkpoint_mode=None):
        # full resume state: scheduler/plateau internals, best-so-far valid
        # loss and the dropout key stream root (the reference checkpoints the
        # full optimizer/scheduler state dicts, ref: trainer.py:949-969)
        counters = {"iters": self.iters, "epoch": self.epoch,
                    "scheduler_epoch": self.scheduler.epoch,
                    "scheduler_state": self.scheduler.state_dict(),
                    "best_valid_loss": self.best_valid_loss,
                    "dropout_key": np.asarray(self.dropout_key).tolist()}
        if checkpoint_path == self.params.checkpoint_path:
            # per-epoch training checkpoints: versioned async manager with
            # keep-N retention (ref behavior: per-epoch ckpt + resume,
            # trainer.py:666-673 — plus history the reference lacks)
            if getattr(self, "_ckpt_mgr", None) is None:
                self._ckpt_mgr = ckpt_lib.TrainingCheckpointer(
                    checkpoint_path,
                    max_to_keep=int(self.params.get("checkpoint_max_to_keep", 3)))
            self._ckpt_mgr.save(self.epoch, self.model_params, self.opt_state, counters)
        else:
            # best checkpoint: single-dir layout, async overwrite
            ckpt_lib.save_checkpoint(checkpoint_path, self.model_params,
                                     self.opt_state, counters)

    def restore_checkpoint(self, checkpoint_path, load_optimizer=None, load_counters=None):
        load_optimizer = self.params.get("load_optimizer", True) if load_optimizer is None else load_optimizer
        load_counters = self.params.get("load_counters", True) if load_counters is None else load_counters

        try:
            params, opt_state, counters = ckpt_lib.restore_checkpoint(
                checkpoint_path, self.model_params,
                self.opt_state if load_optimizer else None)
        except Exception as e:
            if "mismatch" in str(e).lower() or "restore" in str(e).lower():
                raise RuntimeError(
                    f"Checkpoint restore from {checkpoint_path!r} failed with a "
                    "structure mismatch. This usually means the model or "
                    "optimizer configuration changed since the checkpoint was "
                    "written (e.g. a different optimizer chain, width, or "
                    "layer count). Start a fresh experiment dir, or set "
                    "load_optimizer: false to restore weights only.") from e
            raise
        self.model_params = params
        if load_optimizer and opt_state is not None:
            self.opt_state = opt_state
        if load_counters and counters:
            self.iters = counters.get("iters", 0)
            self.epoch = counters.get("epoch", 0)
            self.startEpoch = self.epoch
            self.scheduler.epoch = counters.get("scheduler_epoch", 0)
            if self.params.get("load_scheduler", True) and "scheduler_state" in counters:
                self.scheduler.load_state_dict(counters["scheduler_state"])
            if "best_valid_loss" in counters:
                self.best_valid_loss = float(counters["best_valid_loss"])
            if counters.get("dropout_key") is not None:
                self.dropout_key = jnp.asarray(
                    np.asarray(counters["dropout_key"], dtype=np.uint32))
            # realign the loader's epoch counter: the shuffle permutation is
            # seeded (base_seed + loader.epoch), so without this a resumed
            # run replays epoch 0's data order instead of continuing the
            # schedule (ref: GeneralES reshuffles by global epoch,
            # dali_es_helper_2d.py:441-457)
            for dl in (self.train_dataloader, self.valid_dataloader):
                if hasattr(dl, "epoch"):
                    dl.epoch = self.epoch

    # ------------------------------------------------------------------
    # debug / self-test harness

    def test_autoregression_pipeline(self):
        """DebugNet pipeline self-test (ref: trainer.py:1113-1220): runs the
        eval forward (exercising the preprocessor round trip), appends the
        *targets* into the history window, and verifies the rolled window
        reproduces exactly the expected target slices. Returns error count."""
        assert self.params.nettype == "DebugNet"
        prep = self.preprocessor
        n_hist = prep.n_history

        fwd = jax.jit(lambda p, x, u: self.model.apply(
            {"params": p}, x, unpredicted_inp=u, deterministic=True))

        error_count = 0
        total_steps = 0
        for data in self.valid_dataloader:
            inp, tar, zen_inp, zen_tar = self._device_batch(data)
            inpt = prep.flatten_history(inp)
            uinp = zen_inp

            predictions = []
            tarlist = [tar[:, i: i + 1] for i in range(tar.shape[1])]
            for idt, targ in enumerate(tarlist):
                total_steps += 1
                pred = fwd(self.model_params, inpt, uinp)
                pred = prep.remove_static_features(pred)
                n_unpred = 0 if uinp is None else uinp.shape[2]
                pred = prep.remove_unpredicted_features(pred, n_unpred)
                if n_hist > 0:
                    prede = prep.expand_history(pred, n_hist + 1)
                    pred = prede[:, -1]
                expected = (targ.shape[0], targ.shape[2], targ.shape[3], targ.shape[4])
                assert pred.shape == expected, f"{pred.shape} != {expected}"
                uinp = prep.advance_unpredicted(uinp, zen_tar, idt)
                inpt = prep.append_history(inpt, prep.flatten_history(targ))
                predictions.append(np.asarray(inpt))

            # verify the rolled history windows against target slices
            for idp, predt in enumerate(predictions):
                predte = predt.reshape(predt.shape[0], n_hist + 1, -1, *predt.shape[-2:])
                predsteps = [predte[:, i] for i in range(n_hist + 1)]
                pred_last = min(n_hist + 1, idp + 1)
                pred_comp = predsteps[-pred_last:]
                targ_offset = max(0, idp - n_hist)
                targ_comp = tarlist[targ_offset: targ_offset + pred_last]
                for pc, tc in zip(pred_comp, targ_comp):
                    tc = np.asarray(tc)[:, 0]
                    if not np.allclose(pc, tc, rtol=1e-5, atol=1e-8):
                        error_count += 1

        if self.log_to_screen:
            logger.info(f"Test done ({total_steps} steps): {error_count} errors found.")
        return error_count
