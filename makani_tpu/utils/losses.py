"""Loss handler: spec-string parsed geometric losses on the sphere.

Parity with ref: makani/utils/losses.py:34-370. The loss spec is a token
string, e.g. "weighted squared temp-std geometric l2"; tokens:
{l1, l2, geometric h1, geometric, absolute, squared, weighted, temp-std,
pole-masked}. All compute is jit-safe jnp; weight tables are host numpy.
"""

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature
from makani_tpu.ops.sht import RealSHT


class GeometricLpLoss:
    """Quadrature-weighted absolute/relative Lp loss on the sphere
    (ref: losses.py:183-271)."""

    def __init__(self, img_shape, crop_shape=None, crop_offset=(0, 0), p=2.0,
                 size_average=False, reduction=True, absolute=False, squared=False,
                 pole_mask=0, jacobian="s2", quadrature_rule="naive"):
        self.p = p
        self.reduction = reduction
        self.size_average = size_average
        self.absolute = absolute
        self.squared = squared
        if jacobian == "flat":
            # uniform weights normalized to 1
            shape = crop_shape if crop_shape is not None else img_shape
            qw = np.full((1, 1, *shape), 1.0 / (shape[0] * shape[1]), dtype=np.float32)
            self.quadrature = lambda x: jnp.sum(x * jnp.asarray(qw, dtype=x.dtype), axis=(-2, -1))
        else:
            self.quadrature = GridQuadrature(
                quadrature_rule, img_shape=img_shape, crop_shape=crop_shape,
                crop_offset=crop_offset, normalize=True, pole_mask=pole_mask,
            )

    def abs(self, prd, tar, chw):
        num_examples = prd.shape[0]
        all_norms = self.quadrature(jnp.abs(prd - tar) ** self.p)
        all_norms = all_norms.reshape(num_examples, -1)
        if not self.squared:
            all_norms = all_norms ** (1.0 / self.p)
        all_norms = chw * all_norms
        if self.reduction:
            return jnp.mean(all_norms) if self.size_average else jnp.sum(all_norms)
        return all_norms

    def rel(self, prd, tar, chw):
        num_examples = prd.shape[0]
        diff_norms = self.quadrature(jnp.abs(prd - tar) ** self.p).reshape(num_examples, -1)
        tar_norms = self.quadrature(jnp.abs(tar) ** self.p).reshape(num_examples, -1)
        frac_norms = diff_norms / tar_norms
        if not self.squared:
            frac_norms = frac_norms ** (1.0 / self.p)
        retval = chw * frac_norms
        if self.reduction:
            return jnp.mean(retval) if self.size_average else jnp.sum(retval)
        return retval

    def __call__(self, prd, tar, chw):
        return self.abs(prd, tar, chw) if self.absolute else self.rel(prd, tar, chw)


class GeometricH1Loss:
    """SHT-based spectral H1/L2 mixed loss (ref: losses.py:275-370)."""

    def __init__(self, img_shape, p=2.0, size_average=False, reduction=True,
                 absolute=False, squared=False, alpha=0.5):
        self.reduction = reduction
        self.size_average = size_average
        self.absolute = absolute
        self.squared = squared
        self.alpha = alpha
        self.sht = RealSHT(*img_shape, grid="equiangular")
        h1 = np.arange(self.sht.lmax, dtype=np.float32)
        self.h1_weights = h1 * (h1 + 1)

    def _norms2(self, x):
        coeffs = self.sht(x)
        power = jnp.real(coeffs) ** 2 + jnp.imag(coeffs) ** 2
        norm2 = power[..., 0] + 2 * jnp.sum(power[..., 1:], axis=-1)  # (B, C, L)
        num = x.shape[0]
        l2 = norm2.reshape(num, -1).sum(axis=-1)
        h1 = (norm2 * jnp.asarray(self.h1_weights)).reshape(num, -1).sum(axis=-1)
        return l2, h1

    def _mix(self, l2, h1):
        if not self.squared:
            return self.alpha * jnp.sqrt(l2) + (1 - self.alpha) * jnp.sqrt(h1)
        return self.alpha * l2 + (1 - self.alpha) * h1

    def __call__(self, prd, tar, chw=None):
        l2, h1 = self._norms2(prd - tar)
        diff = self._mix(l2, h1)
        if self.absolute:
            out = diff
        else:
            tl2, th1 = self._norms2(tar)
            out = diff / self._mix(tl2, th1)
        if self.reduction:
            return jnp.mean(out) if self.size_average else jnp.sum(out)
        return out


class LossHandler:
    """Parses the loss spec string and computes the (channel- and
    multistep-weighted) training loss (ref: losses.py:34-179). Spatial-model-
    parallel gathers are handled by running the loss on globally-sharded
    arrays under GSPMD (sums are global)."""

    def __init__(self, params):
        self.n_future = params.n_future

        self.img_shape = (params.img_shape_x, params.img_shape_y)
        self.crop_shape = (params.img_crop_shape_x, params.img_crop_shape_y)
        self.crop_offset = (params.img_crop_offset_x, params.img_crop_offset_y)

        self.loss_type = params.loss
        loss_type = set(params.loss.split())

        pole_mask = 1 if "pole-masked" in loss_type else 0

        if "weighted" in loss_type:
            if params.channel_weights == "auto":
                channel_weights = np.ones(params.N_out_channels, dtype=np.float32)
                for c, chn in enumerate(params.channel_names):
                    # fork behavior: sst gets zero weight (ref: losses.py:62-66)
                    channel_weights[c] = 0.0 if chn in ["sst"] else 1.0
            else:
                channel_weights = np.asarray(params.channel_weights, dtype=np.float32)
        else:
            channel_weights = np.ones(params.N_out_channels, dtype=np.float32)

        channel_weights = channel_weights.reshape(1, -1, 1, 1)
        channel_weights = channel_weights / np.sum(channel_weights)

        absolute = "absolute" in loss_type
        squared = "squared" in loss_type

        if "temp-std" in loss_type:
            eps = 1e-6
            global_stds = np.load(params.global_stds_path).reshape(1, -1, 1, 1)[:, params.out_channels]
            time_diff_stds = np.sqrt(params.dt) * np.load(params.time_diff_stds_path).reshape(1, -1, 1, 1)[:, params.out_channels]
            time_var_weights = global_stds / (time_diff_stds + eps)
            if squared:
                time_var_weights = time_var_weights**2
            channel_weights = channel_weights * time_var_weights

        self.channel_weights = channel_weights.astype(np.float32)

        quadrature_rule_type = "naive"
        if params.model_grid_type == "legendre_gauss":
            quadrature_rule_type = "legendre-gauss"

        if "l2" in loss_type:
            if "geometric" in loss_type:
                self.loss_obj = GeometricLpLoss(
                    self.img_shape, self.crop_shape, self.crop_offset, p=2,
                    absolute=absolute, squared=squared, pole_mask=pole_mask,
                    quadrature_rule=quadrature_rule_type)
            else:
                self.loss_obj = GeometricLpLoss(
                    self.img_shape, self.crop_shape, self.crop_offset, p=2,
                    absolute=absolute, pole_mask=pole_mask, jacobian="flat")
        elif "l1" in loss_type:
            if "geometric" in loss_type:
                self.loss_obj = GeometricLpLoss(
                    self.img_shape, self.crop_shape, self.crop_offset, p=1,
                    absolute=absolute, pole_mask=pole_mask,
                    quadrature_rule=quadrature_rule_type)
            else:
                self.loss_obj = GeometricLpLoss(
                    self.img_shape, self.crop_shape, self.crop_offset, p=1,
                    absolute=absolute, pole_mask=pole_mask, jacobian="flat")
        elif "geometric h1" in self.loss_type:
            self.loss_obj = GeometricH1Loss(self.img_shape, absolute=absolute, squared=squared)
        else:
            raise ValueError(f"Unknown loss function: {self.loss_type}")

        # canonical uniform multistep weights (ref: losses.py:134-140)
        self.multistep_weight = (
            np.ones((self.n_future + 1, 1, 1, 1), dtype=np.float32) / float(self.n_future + 1)
        )

    def __call__(self, prd, tar, inp=None, training=True):
        chw = jnp.asarray(self.channel_weights)
        if training:
            chw = (chw * jnp.asarray(self.multistep_weight)).reshape(1, -1)
        else:
            chw = chw.reshape(1, -1)
        return self.loss_obj(prd, tar, chw)
