"""Grid quadrature and latitude-grid conversion.

Parity with ref: makani/utils/grids.py:22-115. Weight tables are host numpy;
the apply functions are jit-safe jnp ops.
"""

import numpy as np
import jax.numpy as jnp

from makani_tpu.ops.quadrature import (
    clenshaw_curtiss_nodes_weights,
    legendre_gauss_nodes_weights,
)


class GridConverter:
    """Equiangular -> Legendre-Gauss latitude regridding by linear
    interpolation (ref: grids.py:22-60). lat/lon in radians, lat descending or
    ascending consistent with data layout; matches the reference's
    searchsorted+lerp construction."""

    def __init__(self, src_grid, dst_grid, lat_rad, lon_rad):
        self.src = src_grid
        self.dst = dst_grid
        self.src_lat = np.asarray(lat_rad, dtype=np.float64)
        self.src_lon = np.asarray(lon_rad, dtype=np.float64)

        if self.src != self.dst:
            if self.dst == "legendre-gauss":
                cost_lg, _ = legendre_gauss_nodes_weights(self.src_lat.shape[0], -1, 1)
                tq = np.arccos(cost_lg) - np.pi / 2.0
                self.dst_lat = tq
                self.dst_lon = self.src_lon

                # indices of the left neighbor in the (descending) source grid
                permutation = np.arange(self.src_lat.shape[0] - 1, -1, -1)
                jj = np.searchsorted(self.src_lat, self.dst_lat, sorter=permutation) - 1
                self.indices = jj[permutation]
                self.interp_weights = (
                    (self.dst_lat - self.src_lat[self.indices])
                    / np.diff(self.src_lat)[np.clip(self.indices, 0, len(self.src_lat) - 2)]
                ).reshape(-1, 1).astype(np.float32)
            else:
                raise NotImplementedError(f"Error, destination grid type {self.dst} not implemented.")
        else:
            self.dst_lat = self.src_lat
            self.dst_lon = self.src_lon

    def get_src_coords(self):
        return self.src_lat, self.src_lon

    def get_dst_coords(self):
        return self.dst_lat, self.dst_lon

    def __call__(self, data):
        if self.src == self.dst:
            return data
        lo = data[..., self.indices, :]
        hi = data[..., self.indices + 1, :]
        w = jnp.asarray(self.interp_weights, dtype=data.dtype)
        return lo + (hi - lo) * w


def grid_quadrature_weights(quadrature_rule, img_shape, normalize=False, pole_mask=None,
                            crop_shape=None, crop_offset=(0, 0)):
    """(H, W) quadrature weight map (ref: grids.py:63-111)."""
    if quadrature_rule == "naive":
        jacobian = np.clip(np.sin(np.linspace(0, np.pi, img_shape[0])), 0.0, None)
        dtheta = np.pi / img_shape[0]
        dlambda = 2 * np.pi / img_shape[1]
        dA = dlambda * dtheta
        quad_weight = dA * jacobian[:, None]
        quad_weight = np.tile(quad_weight, (1, img_shape[1]))
        # numerical precision: enforce sum = 4 pi
        quad_weight = quad_weight * (4.0 * np.pi) / np.sum(quad_weight)
    elif quadrature_rule == "clenshaw-curtiss":
        cost, w = clenshaw_curtiss_nodes_weights(img_shape[0], -1, 1)
        dlambda = 2 * np.pi / img_shape[1]
        quad_weight = dlambda * np.flip(w)[:, None]
        quad_weight = np.tile(quad_weight, (1, img_shape[1]))
    elif quadrature_rule == "legendre-gauss":
        cost, w = legendre_gauss_nodes_weights(img_shape[0], -1, 1)
        dlambda = 2 * np.pi / img_shape[1]
        quad_weight = dlambda * np.flip(w)[:, None]
        quad_weight = np.tile(quad_weight, (1, img_shape[1]))
    else:
        raise ValueError(f"Unknown quadrature rule {quadrature_rule}")

    if normalize:
        quad_weight = quad_weight / (4.0 * np.pi)

    if (pole_mask is not None) and (pole_mask > 0):
        quad_weight[:pole_mask, :] = 0.0
        quad_weight[img_shape[0] - pole_mask:, :] = 0.0

    if crop_shape is not None:
        quad_weight = quad_weight[
            crop_offset[0]: crop_offset[0] + crop_shape[0],
            crop_offset[1]: crop_offset[1] + crop_shape[1],
        ]

    return np.ascontiguousarray(quad_weight, dtype=np.float32)


class GridQuadrature:
    """Quadrature-weighted integral over the last two axes (ref: grids.py:63-115)."""

    def __init__(self, quadrature_rule, img_shape, crop_shape=None, crop_offset=(0, 0),
                 normalize=False, pole_mask=None):
        qw = grid_quadrature_weights(
            quadrature_rule, img_shape, normalize=normalize, pole_mask=pole_mask,
            crop_shape=crop_shape, crop_offset=crop_offset,
        )
        self.quad_weight = qw.reshape(1, 1, *qw.shape)

    def __call__(self, x):
        return jnp.sum(x * jnp.asarray(self.quad_weight, dtype=x.dtype), axis=(-2, -1))
