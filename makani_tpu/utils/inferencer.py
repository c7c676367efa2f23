"""Inference engine.

Parity with ref: makani/utils/inferencer.py:45-464 (a fork-extended Trainer):
  - score / epoch modes: full-dataset autoregressive scoring with ACC/RMSE
    curve export and the fork's RMSE-over-time / RMSE-over-space npy dumps
    (ref: inferencer.py:163-165,371-388)
  - lite mode: rollout without targets, optional initial-condition
    perturbation and SST persistence — exposed as config capabilities
    (`ic_perturbation_std`, `sst_persistence_channels`) instead of the fork's
    hardcoded edits (ref: inferencer.py:228-241)
  - predict: denormalized physical-unit predictions

Rollouts run as jitted device loops; captures come back as stacked arrays.
"""

import logging
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.data import get_dataloader, init_distributed_io
from makani_tpu.models import model_registry
from makani_tpu.parallel import comm
from makani_tpu.utils import checkpoint as ckpt_lib
from makani_tpu.utils.losses import LossHandler
from makani_tpu.utils.metric import MetricsHandler
from makani_tpu.utils.trainer import Trainer

logger = logging.getLogger(__name__)


class Inferencer(Trainer):
    def __init__(self, params, world_rank=0):
        self.params = None
        self.world_rank = world_rank
        self.log_to_screen = params.get("log_to_screen", False)
        self.data_parallel_size = max(comm.get_size("data"), 1)
        self.data_parallel_rank = comm.get_rank("data")
        self.mesh = comm.get_mesh()

        self.amp_dtype = None
        if params.get("amp_mode", "none") in ("bf16", "fp16"):
            self.amp_dtype = jnp.bfloat16

        params["resuming"] = False

        # validation loader reads the out-of-sample inf_data_path
        params = init_distributed_io(params)
        self.valid_dataloader, self.valid_dataset = get_dataloader(
            params, params.inf_data_path, train=False, final_eval=True)

        params = self._update_parameters(params)
        self.params = params

        self.model = model_registry.get_model(params)
        self.preprocessor = self.model.preprocessor

        # init then restore (global crop shapes: GSPMD programs see global
        # logical arrays; img_local_* only governs per-process host IO)
        n_pred_chans = len(params.in_channels)
        init_inp = jnp.zeros((1, (params.n_history + 1) * n_pred_chans,
                              params.img_crop_shape_x, params.img_crop_shape_y), jnp.float32)
        init_zen = None
        if params.get("add_zenith", False):
            init_zen = jnp.zeros((1, params.n_history + 1, 1,
                                  params.img_crop_shape_x, params.img_crop_shape_y), jnp.float32)
        variables = jax.jit(lambda key: self.model.init(
            key, init_inp, unpredicted_inp=init_zen, deterministic=True))(
            jax.random.PRNGKey(0))
        self.model_params = variables["params"]

        self.model_params, _, _ = ckpt_lib.restore_checkpoint(
            params.checkpoint_path, self.model_params, None)

        # place the restored params on the full mesh (sharded over model
        # axes per the rules, replicated under pure data parallelism —
        # same placement step as the Trainer)
        if comm.get_world_size() > 1:
            from makani_tpu.parallel.partitioning import (
                get_param_shardings, shard_tree)
            self.model_params = shard_tree(
                self.model_params, get_param_shardings(self.model_params, self.mesh))

        mult, clim = self._get_time_stats()
        self.metrics = MetricsHandler(params, mult, clim)
        self.loss_obj = LossHandler(params)

        self.global_means_path = params.global_means_path
        self.global_stds_path = params.global_stds_path

        # fork RMSE accumulators (ref: inferencer.py:163-165)
        S = params.valid_autoreg_steps + 1
        C = params.N_out_channels
        H, W = params.img_crop_shape_x, params.img_crop_shape_y
        self._rmse_shapes = (S, C, H, W)

        self.sst_persistence_channels = tuple(params.get("sst_persistence_channels", ()) or ())
        self.ic_perturbation_std = params.get("ic_perturbation_std", None)

        self._build_inference_steps()

    # ------------------------------------------------------------------

    def _build_inference_steps(self):
        """All rollouts are a host loop over ONE compiled AR step with a
        traced rollout index — program size is independent of
        valid_autoreg_steps (the reference's per-step python loop, ref:
        inferencer.py:167-249; an unrolled 20x jit would not compile at
        flagship scale)."""
        model = self.model
        prep = self.preprocessor
        loss_obj = self.loss_obj
        metrics = self.metrics
        self._S = self.params.valid_autoreg_steps + 1
        sst_ch = self.sst_persistence_channels

        def fwd(p, inpt, uinp):
            x = inpt if self.amp_dtype is None else inpt.astype(self.amp_dtype)
            return model.apply({"params": p}, x, unpredicted_inp=uinp,
                               deterministic=True).astype(jnp.float32)

        data_size = float(self.data_parallel_size)

        def metrics_step(p, buffers, rmse_t, rmse_s, inpt, uinp, tar, zen_tar, idt):
            """(ref: inferencer.py:167-206). Loss is divided by data_size so
            the reported validation loss matches Trainer's eval step
            (trainer.py eval_ar_step) under data-parallel inference — the
            metric psum over the data axis then yields the MEAN."""
            targ = prep.flatten_history(
                jax.lax.dynamic_slice_in_dim(tar, idt, 1, axis=1))
            pred = fwd(p, inpt, uinp)
            loss = loss_obj(pred, targ, inpt, training=False) / data_size
            buffers = metrics.update(buffers, pred, targ, loss, idt)
            sqdif = jnp.sum((pred - targ) ** 2, axis=0)  # (C, H, W), sum over batch
            rmse_t = rmse_t.at[idt].add(jnp.mean(sqdif, axis=(-2, -1)))
            rmse_s = rmse_s + sqdif
            uinp = prep.advance_unpredicted_dyn(uinp, zen_tar, idt)
            inpt = prep.append_history(inpt, pred)
            return buffers, rmse_t, rmse_s, inpt, uinp

        def capture_step(p, inpt, uinp, tar, zen_tar, idt):
            targ = prep.flatten_history(
                jax.lax.dynamic_slice_in_dim(tar, idt, 1, axis=1))
            pred = fwd(p, inpt, uinp)
            uinp = prep.advance_unpredicted_dyn(uinp, zen_tar, idt)
            inpt_next = prep.append_history(inpt, pred)
            return pred, targ, inpt_next, uinp

        def lite_step(p, inpt, uinp, zen_tar, idt):
            """(ref: inferencer.py:209-249): no targets; optional SST
            persistence pins configured channels to the IC value (pinning
            each step keeps the channel at its IC value inductively)."""
            pred = fwd(p, inpt, uinp)
            for c in sst_ch:
                pred = pred.at[:, c].set(inpt[:, c])
            uinp = prep.advance_unpredicted_dyn(uinp, zen_tar, idt)
            inpt_next = prep.append_history(inpt, pred)
            return pred, inpt_next, uinp

        self._metrics_step = self._with_tables(metrics_step, donate=(1, 2, 3, 4, 5))
        self._capture_step = self._with_tables(capture_step, donate=(1, 2))
        self._lite_step = self._with_tables(lite_step, donate=(1, 2))
        self._flatten = jax.jit(prep.flatten_history)

    @staticmethod
    def _fresh_uinp(zen_inp):
        """The AR steps donate their rolling zenith input; hand them a copy
        so the caller's zen_inp survives a later rollout over the same batch
        (inference_single with compute_metrics AND output_data)."""
        return None if zen_inp is None else jnp.array(zen_inp, copy=True)

    def _rollout_metrics(self, p, buffers, rmse_t, rmse_s, inp, tar, zen_inp, zen_tar):
        inpt = self._flatten(inp)
        uinp = self._fresh_uinp(zen_inp)
        for idt in range(self._S):
            buffers, rmse_t, rmse_s, inpt, uinp = self._metrics_step(
                p, buffers, rmse_t, rmse_s, inpt, uinp, tar, zen_tar, idt)
        return buffers, rmse_t, rmse_s

    def _rollout_capture(self, p, inp, tar, zen_inp, zen_tar):
        inpt = self._flatten(inp)
        uinp = self._fresh_uinp(zen_inp)
        preds, targs = [], []
        for idt in range(self._S):
            pred, targ, inpt, uinp = self._capture_step(
                p, inpt, uinp, tar, zen_tar, idt)
            preds.append(np.asarray(pred))
            targs.append(np.asarray(targ))
        return np.stack(preds, axis=0), np.stack(targs, axis=0)

    def _rollout_lite(self, p, inp, zen_inp, zen_tar):
        inpt = self._flatten(inp)
        uinp = self._fresh_uinp(zen_inp)
        preds = []
        for idt in range(self._S):
            pred, inpt, uinp = self._lite_step(p, inpt, uinp, zen_tar, idt)
            preds.append(np.asarray(pred))
        return np.stack(preds, axis=0)

    def _get_batch(self, ic):
        """Random-access initial-condition fetch: direct indexed dataset
        reads, no loader iteration (ref capability:
        makani/utils/dataloaders/data_loader_random_access.py)."""
        offset = 0 if self.params.get("samples_offset", None) is None \
            else int(self.params.samples_offset)
        idx = offset + ic
        if idx >= len(self.valid_dataset):
            raise IndexError(f"initial condition {ic} beyond dataset")
        sample = self.valid_dataset[idx]
        batch = tuple(np.asarray(f)[None] for f in sample)
        return self._device_batch(batch)

    # ------------------------------------------------------------------
    # public API (ref: inferencer.py:251-455)

    def inference_single(self, ic=0, compute_metrics=False, output_data=False,
                         output_channels=(0, 1)):
        inp, tar, zen_inp, zen_tar = self._get_batch(ic)
        result = []
        if compute_metrics:
            buffers = self.metrics.initialize_buffers()
            S, C, H, W = self._rmse_shapes
            rt = jnp.zeros((S, C), jnp.float32)
            rs = jnp.zeros((C, H, W), jnp.float32)
            buffers, rt, rs = self._rollout_metrics(
                self.model_params, buffers, rt, rs, inp, tar, zen_inp, zen_tar)
            self.metrics.finalize(buffers)
        if output_data:
            preds, targs = self._rollout_capture(self.model_params, inp, tar, zen_inp, zen_tar)
            oc = list(output_channels)
            result += [np.asarray(targs[:, :, oc]), np.asarray(preds[:, :, oc])]
        return tuple(result)

    def inference_lite(self, ic=0, output_data=False, output_channels=(0, 1)):
        inp, tar, zen_inp, zen_tar = self._get_batch(ic)
        if self.ic_perturbation_std:
            # optional IC perturbation (ref: inferencer.py:228-231)
            rng = np.random.RandomState(42)
            inp_np = np.asarray(inp)
            for ch, std in dict(self.ic_perturbation_std).items():
                inp_np[:, :, int(ch)] += rng.normal(0.0, std, inp_np.shape[-2:]).astype(np.float32)
            inp = jnp.asarray(inp_np)
        preds = self._rollout_lite(self.model_params, inp, zen_inp, zen_tar)
        if output_data:
            return (np.asarray(preds[:, :, list(output_channels)]),)
        return ()

    def predict(self, ic=0):
        """Denormalized predictions in physical units (ref: inferencer.py:318-346)."""
        global_means = np.load(self.global_means_path)
        global_stds = np.load(self.global_stds_path)
        channels = list(range(self.params.N_out_channels))
        (targ, preds) = self.inference_single(ic, output_data=True, output_channels=channels)
        predictions = np.asarray(preds).squeeze()
        out_ch = self.params.out_channels
        return predictions * global_stds[:, out_ch, 0, 0].reshape(1, -1, 1, 1) \
            + global_means[:, out_ch, 0, 0].reshape(1, -1, 1, 1)

    def inference_epoch(self, output_channels):
        """(ref: inferencer.py:349-397)."""
        buffers = self.metrics.initialize_buffers()
        S, C, H, W = self._rmse_shapes
        rt = jnp.zeros((S, C), jnp.float32)
        rs = jnp.zeros((C, H, W), jnp.float32)

        eval_samples = 0
        for data in self.valid_dataloader:
            inp, tar, zen_inp, zen_tar = self._device_batch(data)
            # GLOBAL sample count: rs/rt hold global (all-data-rank) sums, so
            # the divisor must be global too. _device_batch guarantees a
            # globally-assembled batch dim in both deployments (single-process
            # device_put of the full batch; multi-process
            # make_array_from_process_local_data with gshape[0]=global). Guard
            # the invariant so a future port that feeds LOCAL shards here
            # fails loudly instead of silently skewing the exported RMSE.
            if jax.process_count() > 1:
                local_b = int(np.asarray(data[0]).shape[0])
                assert int(inp.shape[0]) == local_b * self.data_parallel_size, (
                    "inference_epoch expects _device_batch to assemble the "
                    "GLOBAL batch; got a local shard")
            eval_samples += int(inp.shape[0])
            buffers, rt, rs = self._rollout_metrics(
                self.model_params, buffers, rt, rs, inp, tar, zen_inp, zen_tar)

        # metrics_step SUMS squared error over the batch dim, so normalize by
        # the number of SAMPLES (not batches) — with batch_size>1 a
        # batch-count divisor would scale the exported RMSE with batch size
        # (same class of bug fixed in metric.py batch accounting).
        eval_samples = max(eval_samples, 1)
        rmse_over_space = np.asarray(rs) / (S * eval_samples)
        rmse_over_time = np.sqrt(np.asarray(rt) / eval_samples)
        rmse_over_space = np.sqrt(rmse_over_space)

        logs, acc_curves, rmse_curves = self.metrics.finalize(buffers, final_inference=True)

        if self.world_rank == 0:
            exp_dir = self.params.experiment_dir
            np.save(os.path.join(exp_dir, "acc_curves.npy"), acc_curves)
            np.save(os.path.join(exp_dir, "rmse_curves.npy"), rmse_curves)
            global_stds = np.load(self.global_stds_path)
            oc = output_channels
            np.save(os.path.join(exp_dir, "RMSE_over_time.npy"),
                    rmse_over_time * global_stds[:, oc, 0, 0])
            np.save(os.path.join(exp_dir, "RMSE_over_space.npy"),
                    rmse_over_space * global_stds[0, oc])

            # rollout curve plots (ref: inferencer.py:391)
            try:
                from makani_tpu.utils.visualize import plot_rollout_metrics
                plot_rollout_metrics(acc_curves, rmse_curves, self.params,
                                     epoch=0, model_name=self.params.nettype)
            except Exception as e:
                logger.warning(f"rollout plotting failed: {e}")

        return logs

    def log_score(self, scoring_logs, scoring_time):
        if not self.log_to_screen:
            return
        separator = "-" * 50
        prefix = "    "
        logger.info(separator)
        logger.info("Scoring summary:")
        logger.info("Total scoring time is {:.2f} sec".format(scoring_time))
        print_list = list(scoring_logs["metrics"].keys())
        max_len = max(len(x) for x in print_list) if print_list else 0
        logger.info("Metrics:")
        for key in print_list:
            value = scoring_logs["metrics"][key]
            if np.isscalar(value):
                logger.info(f"{prefix}{key}: {' ' * (max_len - len(key))}{value}")
        logger.info(separator)

    def score_model(self, output_channels):
        if self.log_to_screen:
            logger.info("Starting Scoring...")
        scoring_start = time.time()
        scoring_logs = self.inference_epoch(output_channels=output_channels)
        self.log_score(scoring_logs, time.time() - scoring_start)
        return scoring_logs
