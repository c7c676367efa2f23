"""Validation metrics handler: rollout ACC/RMSE curves, loss/L1 buffers.

Parity with ref: makani/utils/metric.py:27-306. Buffers live as a jnp pytree
("metric state") threaded through a jitted update function — the JAX analog
of the reference's device-resident buffers + CUDA-graph-safe updates. Data-
parallel reductions happen automatically because updates run on globally
sharded arrays under GSPMD (sums are global sums).
"""

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.utils.metrics.functions import (
    GeometricACC,
    GeometricL1,
    GeometricRMSE,
    Quadrature,
)

DEFAULT_VAR_NAMES = ["u10m", "t2m", "u500", "z500", "r500", "q500"]


class MetricsHandler:
    def __init__(self, params, mult, clim,
                 rmse_var_names=DEFAULT_VAR_NAMES,
                 acc_var_names=DEFAULT_VAR_NAMES,
                 acc_auc_var_names=DEFAULT_VAR_NAMES):
        self.channel_names = list(params.channel_names)

        # effective time interval, steps per day
        self.dtxdh = params.dt * params.dhours

        rmse_var_names = [x for x in rmse_var_names if x in self.channel_names]
        acc_var_names = [x for x in acc_var_names if x in self.channel_names]
        acc_auc_var_names = [x for x in acc_auc_var_names if x in self.channel_names]
        self.rmse_vars = {v: self.channel_names.index(v) for v in rmse_var_names}
        self.acc_vars = {v: self.channel_names.index(v) for v in acc_var_names}
        self.acc_auc_vars = {v: self.channel_names.index(v) for v in acc_auc_var_names}

        self.N_out_channels = params.N_out_channels
        self.valid_autoreg_steps = params.valid_autoreg_steps

        # split_data_channels: shard the data-channel dim of the metric
        # compute + buffers over the matmul (fin x fout) axes (ref:
        # makani/train.py:51, trainer.py:92-95, metric.py:87-91,222-243).
        # Under GSPMD this is expressed as in-graph channel-sharding
        # constraints; the reference's explicit channel-shard all-gather in
        # finalize (metric.py:222-243) happens implicitly when the global
        # buffers are fetched to host.
        from makani_tpu.parallel import comm as _comm
        self.split_data_channels = bool(params.get("split_data_channels", False)) \
            and _comm.get_size("matmul") > 1

        self.mult = np.asarray(mult, dtype=np.float32).reshape(-1)  # (C,) denorm scale
        self.clim = np.asarray(clim, dtype=np.float32)[None]  # (1, C, H, W)

        self.simpquad = Quadrature(self.valid_autoreg_steps, 1.0 / float(self.valid_autoreg_steps + 1))

        self.img_shape = (params.img_shape_x, params.img_shape_y)
        self.crop_shape = (params.img_crop_shape_x, params.img_crop_shape_y)
        self.crop_offset = (params.img_crop_offset_x, params.img_crop_offset_y)

        quadrature_rule_type = "naive"
        if params.model_grid_type == "legendre_gauss":
            quadrature_rule_type = "legendre-gauss"

        kw = dict(img_shape=self.img_shape, crop_shape=self.crop_shape,
                  crop_offset=self.crop_offset, normalize=True)
        # batch_reduction="mean" (not the reference's "sum"): see update()
        self.l1_handle = GeometricL1(quadrature_rule_type, channel_reduction="mean", batch_reduction="mean", **kw)
        self.rmse_handle = GeometricRMSE(quadrature_rule_type, channel_reduction="none", batch_reduction="none", **kw)
        self.acc_handle = GeometricACC(quadrature_rule_type, channel_reduction="none", batch_reduction="sum", **kw)

    # --- buffer management (a pure pytree) ---

    def initialize_buffers(self) -> Dict[str, jnp.ndarray]:
        C, S = self.N_out_channels, self.valid_autoreg_steps + 1
        return {
            "valid_loss": jnp.zeros((), jnp.float32),
            "valid_l1": jnp.zeros((), jnp.float32),
            "valid_steps": jnp.zeros((), jnp.float32),
            "acc_curve": jnp.zeros((C, S), jnp.float32),
            "rmse_curve": jnp.zeros((C, S), jnp.float32),
            "acc_counter": jnp.zeros((S,), jnp.float32),
        }

    zero_buffers = initialize_buffers

    def update(self, buffers, prediction, target, loss, idt):
        """Pure update for AR step idt (a static int under the rollout's
        python unroll, or a traced index with .at updates). Returns new
        buffers (ref: metric.py:186-204)."""
        clim = jnp.asarray(self.clim, dtype=prediction.dtype)
        mult = jnp.asarray(self.mult)

        if self.split_data_channels:
            from makani_tpu.parallel import spmd
            # per-channel metric compute runs channel-sharded over matmul
            prediction = spmd.constrain(prediction, "data", ("fin", "fout"), "h", "w")
            target = spmd.constrain(target, "data", ("fin", "fout"), "h", "w")
            clim = spmd.constrain(clim, None, ("fin", "fout"), "h", "w")

        acc = self.acc_handle(prediction - clim, target - clim)
        rmse = mult * jnp.sum(self.rmse_handle(prediction, target), axis=0)

        if self.split_data_channels:
            from makani_tpu.parallel import spmd
            acc = spmd.constrain(acc, ("fin", "fout"))
            rmse = spmd.constrain(rmse, ("fin", "fout"))

        buffers = dict(buffers)
        buffers["acc_curve"] = buffers["acc_curve"].at[:, idt].add(acc)
        buffers["rmse_curve"] = buffers["rmse_curve"].at[:, idt].add(rmse)
        if self.split_data_channels:
            from makani_tpu.parallel import spmd
            buffers["acc_curve"] = spmd.constrain(buffers["acc_curve"], ("fin", "fout"), None)
            buffers["rmse_curve"] = spmd.constrain(buffers["rmse_curve"], ("fin", "fout"), None)
        # Deliberate deviation from the reference: curves accumulate batch
        # SUMS, so the counter counts SAMPLES (global batch), making the
        # finalized curves true per-sample means at any validation batch
        # size. The reference divides its batch-summed buffers by the number
        # of update CALLS, so its curves scale with the batch size when
        # batch > 1 (ref: makani/utils/metric.py:194-196, 255-258).
        buffers["acc_counter"] = buffers["acc_counter"].at[idt].add(float(prediction.shape[0]))

        first = jnp.asarray(idt == 0, jnp.float32)
        buffers["valid_steps"] = buffers["valid_steps"] + first
        buffers["valid_loss"] = buffers["valid_loss"] + first * loss
        buffers["valid_l1"] = buffers["valid_l1"] + first * self.l1_handle(prediction, target)
        return buffers

    def finalize(self, buffers, final_inference=False):
        """Assemble the logs dict (ref: metric.py:206-306). Host-side."""
        buffers = jax.device_get(buffers)
        valid_steps = float(buffers["valid_steps"])
        valid_loss = float(buffers["valid_loss"]) / max(valid_steps, 1.0)
        valid_l1 = float(buffers["valid_l1"]) / max(valid_steps, 1.0)

        counter = np.maximum(np.asarray(buffers["acc_counter"]), 1.0)
        acc_curve = np.asarray(buffers["acc_curve"]) / counter
        rmse_curve = np.asarray(buffers["rmse_curve"]) / counter

        acc_auc = np.asarray(self.simpquad(jnp.asarray(acc_curve), dim=1))

        logs = {
            "base": {
                "validation steps": int(valid_steps),
                "validation loss": valid_loss,
                "validation L1": valid_l1,
            },
            "metrics": {},
        }

        for var_name, var_idx in self.rmse_vars.items():
            logs["metrics"]["validation " + var_name] = float(rmse_curve[var_idx, 0])
        for var_name, var_idx in self.acc_auc_vars.items():
            logs["metrics"]["ACC AUC " + var_name] = float(acc_auc[var_idx])

        table_data = []
        for var_name, var_idx in self.acc_vars.items():
            for d in range(self.valid_autoreg_steps + 1):
                table_data.append(["ACC", var_name, (d + 1) * self.dtxdh, float(acc_curve[var_idx, d])])
        for var_name, var_idx in self.rmse_vars.items():
            for d in range(self.valid_autoreg_steps + 1):
                table_data.append(["RMSE", var_name, (d + 1) * self.dtxdh, float(rmse_curve[var_idx, d])])
        logs["metrics"]["rollouts"] = table_data

        self.logs = logs

        if final_inference:
            return logs, acc_curve, rmse_curve
        return logs
