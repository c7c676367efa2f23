"""Metric cross-validation against analytic spherical integrals.

Mirrors the reference strategy (ref: tests/test_metrics.py:26-60 validates
against xarray+xskillscore); here the independent reference is closed-form
integrals of analytic fields on the sphere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.grids import GridQuadrature, grid_quadrature_weights
from makani_tpu.utils.metrics.functions import (
    GeometricACC,
    GeometricL1,
    GeometricRMSE,
    SimpsonQuadrature,
)


GRIDS = ["naive", "clenshaw-curtiss", "legendre-gauss"]


def _theta_field(quad_rule, nlat, nlon, fn):
    """Sample fn(theta) on the grid the quadrature rule assumes."""
    if quad_rule == "naive":
        theta = np.linspace(0, np.pi, nlat)
    elif quad_rule == "clenshaw-curtiss":
        from makani_tpu.ops.quadrature import clenshaw_curtiss_nodes_weights
        cost, _ = clenshaw_curtiss_nodes_weights(nlat)
        theta = np.flip(np.arccos(cost))
    else:
        from makani_tpu.ops.quadrature import legendre_gauss_nodes_weights
        cost, _ = legendre_gauss_nodes_weights(nlat)
        theta = np.flip(np.arccos(cost))
    f = fn(theta)[:, None] * np.ones((1, nlon))
    return f.astype(np.float32)


@pytest.mark.parametrize("rule", GRIDS)
@pytest.mark.parametrize("nlat,nlon", [(32, 64), (91, 180)])
def test_quadrature_normalization(rule, nlat, nlon):
    """Weights integrate the unit function to 4 pi (ref: test_metrics.py)."""
    w = grid_quadrature_weights(rule, (nlat, nlon))
    np.testing.assert_allclose(w.sum(), 4 * np.pi, rtol=1e-4)

    q = GridQuadrature(rule, (nlat, nlon), normalize=True)
    one = jnp.ones((1, 1, nlat, nlon))
    np.testing.assert_allclose(float(q(one)[0, 0]), 1.0, rtol=1e-5)


@pytest.mark.parametrize("rule", ["clenshaw-curtiss", "legendre-gauss"])
def test_rmse_analytic(rule):
    """RMSE(cos(theta), 0) = sqrt(<cos^2>) = sqrt(1/3)."""
    nlat, nlon = 64, 128
    rmse = GeometricRMSE(rule, img_shape=(nlat, nlon), normalize=True,
                         channel_reduction="none", batch_reduction="none")
    x = jnp.asarray(_theta_field(rule, nlat, nlon, np.cos))[None, None]
    val = np.asarray(rmse(x, jnp.zeros_like(x)))[0, 0]
    np.testing.assert_allclose(val, np.sqrt(1.0 / 3.0), rtol=1e-4)


@pytest.mark.parametrize("rule", ["clenshaw-curtiss", "legendre-gauss"])
def test_l1_analytic(rule):
    """L1(|cos(theta)|, 0) = <|cos|> = 1/2."""
    nlat, nlon = 64, 128
    l1 = GeometricL1(rule, img_shape=(nlat, nlon), normalize=True,
                     channel_reduction="mean", batch_reduction="mean")
    x = jnp.asarray(_theta_field(rule, nlat, nlon, lambda t: np.abs(np.cos(t))))[None, None]
    val = float(l1(x, jnp.zeros_like(x)))
    np.testing.assert_allclose(val, 0.5, rtol=1e-3)


@pytest.mark.parametrize("rule", GRIDS)
def test_acc_analytic(rule):
    """ACC(x, x) = 1; ACC(cos, -cos) = -1; ACC(cos, sin(phi)-like) = 0."""
    nlat, nlon = 64, 128
    acc = GeometricACC(rule, img_shape=(nlat, nlon), normalize=True,
                       channel_reduction="none", batch_reduction="none")
    x = jnp.asarray(_theta_field(rule, nlat, nlon, np.cos))[None, None]
    np.testing.assert_allclose(float(np.asarray(acc(x, x))[0, 0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(acc(x, -x))[0, 0]), -1.0, rtol=1e-5)

    # orthogonal fields: cos(theta) vs an m=1 harmonic
    phi = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    y = (np.ones((nlat, 1)) * np.sin(phi)[None, :]).astype(np.float32)
    val = float(np.asarray(acc(x, jnp.asarray(y)[None, None]))[0, 0])
    assert abs(val) < 1e-4


def test_simpson_quadrature_exact_for_quadratics():
    """Simpson integrates quadratics exactly."""
    n = 10
    h = 0.1
    quad = SimpsonQuadrature(n, h)
    t = np.arange(n + 1) * h
    vals = jnp.asarray((3 * t**2)[None])  # integral of 3t^2 = t^3
    np.testing.assert_allclose(float(quad(vals, dim=1)[0]), (n * h) ** 3, rtol=1e-6)


def test_metrics_handler_batch_size_invariant(tmp_path):
    """ACC/RMSE curves and L1 are per-sample means independent of the
    validation batch size (deliberate fix of the reference's quirk where
    batch-summed buffers are divided by the number of update calls;
    ref: makani/utils/metric.py:194-196, 255-258)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from testutils import get_default_parameters
    from makani_tpu.utils.metric import MetricsHandler

    params = get_default_parameters()
    params["valid_autoreg_steps"] = 0
    params["N_out_channels"] = len(params.out_channels)
    params["img_crop_shape_x"] = params.img_shape_x
    params["img_crop_shape_y"] = params.img_shape_y
    params["img_crop_offset_x"] = 0
    params["img_crop_offset_y"] = 0
    params["model_grid_type"] = "equiangular"
    C = params.N_out_channels
    H, W = params.img_shape_x, params.img_shape_y
    mult = np.ones((C,), np.float32)
    clim = np.zeros((C, H, W), np.float32)
    handler = MetricsHandler(params, mult, clim)

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(4, C, H, W).astype(np.float32))
    targ = jnp.asarray(rng.randn(4, C, H, W).astype(np.float32))

    # one batch-4 update
    buf = handler.initialize_buffers()
    buf = handler.update(buf, pred, targ, jnp.float32(0.5), 0)
    logs4, acc4, rmse4 = handler.finalize(buf, final_inference=True)

    # four batch-1 updates
    buf = handler.initialize_buffers()
    for i in range(4):
        buf = handler.update(buf, pred[i:i + 1], targ[i:i + 1], jnp.float32(0.5), 0)
    logs1, acc1, rmse1 = handler.finalize(buf, final_inference=True)

    np.testing.assert_allclose(acc4, acc1, rtol=1e-5)
    np.testing.assert_allclose(rmse4, rmse1, rtol=1e-5)
    np.testing.assert_allclose(logs4["base"]["validation L1"],
                               logs1["base"]["validation L1"], rtol=1e-5)
