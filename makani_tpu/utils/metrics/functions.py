"""Geometric metric functions and 1D quadratures for rollout-curve AUC.

Parity with ref: makani/utils/metrics/functions.py:20-163.
"""

import numpy as np
import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature


class _GeometricMetric:
    def __init__(self, grid_type, img_shape, crop_shape=None, crop_offset=(0, 0),
                 normalize=False, channel_reduction="mean", batch_reduction="mean"):
        self.quadrature = GridQuadrature(
            grid_type, img_shape=img_shape, crop_shape=crop_shape,
            crop_offset=crop_offset, normalize=normalize)
        self.channel_reduction = channel_reduction
        self.batch_reduction = batch_reduction

    def _reduce(self, v):
        if self.channel_reduction == "mean":
            v = jnp.mean(v, axis=1)
        elif self.channel_reduction == "sum":
            v = jnp.sum(v, axis=1)
        if self.batch_reduction == "mean":
            v = jnp.mean(v, axis=0)
        elif self.batch_reduction == "sum":
            v = jnp.sum(v, axis=0)
        return v


class GeometricL1(_GeometricMetric):
    def __call__(self, x, y):
        return self._reduce(self.quadrature(jnp.abs(x - y)))


class GeometricRMSE(_GeometricMetric):
    def __call__(self, x, y):
        return jnp.sqrt(self._reduce(self.quadrature(jnp.square(x - y))))


class GeometricACC(_GeometricMetric):
    def __init__(self, *args, eps=1e-8, **kwargs):
        super().__init__(*args, **kwargs)
        self.eps = eps

    def __call__(self, x, y):
        cov_xy = self.quadrature(x * y)
        var_x = self.quadrature(jnp.square(x))
        var_y = self.quadrature(jnp.square(y))
        acc = cov_xy / (jnp.sqrt(var_x * var_y) + self.eps)
        return self._reduce(acc)


class SimpsonQuadrature:
    def __init__(self, num_intervals, interval_width):
        weights = np.zeros(num_intervals + 1, dtype=np.float32)
        if num_intervals % 2 == 0:
            for j in range(1, num_intervals // 2 + 1):
                weights[2 * j - 2] += 1.0
                weights[2 * j - 1] += 4.0
                weights[2 * j] += 1.0
            self.weights = weights * (interval_width / 3.0)
        else:
            raise NotImplementedError("Error, please specify an even number of intervals")

    def __call__(self, x, dim=1):
        shape = [1] * x.ndim
        shape[dim] = -1
        return jnp.sum(x * jnp.asarray(self.weights).reshape(shape), axis=dim)


class TrapezoidQuadrature:
    def __init__(self, num_intervals, interval_width):
        weights = np.full(num_intervals + 1, interval_width, dtype=np.float32)
        weights[0] *= 0.5
        weights[-1] *= 0.5
        self.weights = weights

    def __call__(self, x, dim=1):
        shape = [1] * x.ndim
        shape[dim] = -1
        return jnp.sum(x * jnp.asarray(self.weights).reshape(shape), axis=dim)


class Quadrature:
    def __init__(self, num_intervals, interval_width):
        if num_intervals % 2 == 0:
            self.quad = SimpsonQuadrature(num_intervals, interval_width)
        else:
            self.quad = TrapezoidQuadrature(num_intervals, interval_width)

    def __call__(self, x, dim=1):
        return self.quad(x, dim)
