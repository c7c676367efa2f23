"""Analytic-value tests for the loss-spec matrix (utils/losses.py).

Covers the spec tokens the reference ships in its configs but round 2 only
smoke-tested through "geometric l2": GeometricH1Loss (absolute/relative,
squared or not; ref: makani/utils/losses.py:275-370), pole-masked,
absolute-vs-relative Lp, squared, and temp-std channel weighting
(ref: makani/utils/losses.py:50-179).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from makani_tpu.utils.losses import GeometricLpLoss, GeometricH1Loss, LossHandler
from makani_tpu.utils import ParamsBase

SHAPE = (36, 72)


def _y10_field():
    """A single ortho-normalized spherical harmonic Y_1^0 on the equiangular
    grid, synthesized through the inverse SHT so the analysis coefficients
    are exactly delta_(l=1,m=0)."""
    from makani_tpu.ops.sht import InverseRealSHT

    isht = InverseRealSHT(*SHAPE, grid="equiangular")
    coeffs = np.zeros((1, 1, isht.lmax, isht.mmax), dtype=np.complex64)
    coeffs[0, 0, 1, 0] = 1.0
    return np.asarray(isht(jnp.asarray(coeffs)), dtype=np.float32)


# --------------------------------------------------------------------------
# GeometricH1Loss — norm assembly, h1 weights l(l+1), alpha mix
# --------------------------------------------------------------------------

def test_h1_absolute_squared_single_harmonic():
    # prd - tar = Y_1^0: l2-norm^2 = 1, h1-norm^2 = l(l+1) = 2
    # squared absolute loss = alpha*1 + (1-alpha)*2
    prd = _y10_field()
    tar = np.zeros_like(prd)
    loss = GeometricH1Loss(SHAPE, absolute=True, squared=True, alpha=0.5)
    got = float(loss(jnp.asarray(prd), jnp.asarray(tar)))
    np.testing.assert_allclose(got, 0.5 * 1.0 + 0.5 * 2.0, rtol=1e-3)


def test_h1_absolute_sqrt_mix():
    # non-squared: alpha*sqrt(l2) + (1-alpha)*sqrt(h1)
    prd = _y10_field()
    tar = np.zeros_like(prd)
    loss = GeometricH1Loss(SHAPE, absolute=True, squared=False, alpha=0.25)
    got = float(loss(jnp.asarray(prd), jnp.asarray(tar)))
    np.testing.assert_allclose(got, 0.25 * 1.0 + 0.75 * np.sqrt(2.0), rtol=1e-3)


def test_h1_relative_scale_invariant():
    # prd = 2*tar: diff = tar, so the relative loss is exactly 1 for any
    # alpha, squared or not
    tar = _y10_field()
    prd = 2.0 * tar
    for squared in (False, True):
        loss = GeometricH1Loss(SHAPE, absolute=False, squared=squared, alpha=0.7)
        got = float(loss(jnp.asarray(prd), jnp.asarray(tar)))
        np.testing.assert_allclose(got, 1.0, rtol=1e-3)


def test_h1_batch_reduction_sums_examples():
    prd = np.concatenate([_y10_field()] * 3, axis=0)
    tar = np.zeros_like(prd)
    loss = GeometricH1Loss(SHAPE, absolute=True, squared=True)
    got = float(loss(jnp.asarray(prd), jnp.asarray(tar)))
    np.testing.assert_allclose(got, 3 * 1.5, rtol=1e-3)


# --------------------------------------------------------------------------
# GeometricLpLoss — absolute / relative / squared / pole-masked
# --------------------------------------------------------------------------

def test_lp_absolute_and_relative_constant_fields():
    # constant fields: normalized quadrature integrates to the constant, so
    # absolute l2 = |d| and relative l2 = |d| / |c|
    c, d = 2.0, 0.5
    tar = np.full((1, 1, *SHAPE), c, dtype=np.float32)
    prd = tar + d
    chw = jnp.ones((1, 1))

    abs_loss = GeometricLpLoss(SHAPE, p=2, absolute=True)
    rel_loss = GeometricLpLoss(SHAPE, p=2, absolute=False)
    np.testing.assert_allclose(float(abs_loss(jnp.asarray(prd), jnp.asarray(tar), chw)), d, rtol=1e-5)
    np.testing.assert_allclose(float(rel_loss(jnp.asarray(prd), jnp.asarray(tar), chw)), d / c, rtol=1e-5)


def test_lp_squared_relative():
    c, d = 2.0, 0.5
    tar = np.full((1, 1, *SHAPE), c, dtype=np.float32)
    prd = tar + d
    chw = jnp.ones((1, 1))
    loss = GeometricLpLoss(SHAPE, p=2, absolute=False, squared=True)
    np.testing.assert_allclose(float(loss(jnp.asarray(prd), jnp.asarray(tar), chw)),
                               (d / c) ** 2, rtol=1e-5)


def test_lp_pole_mask_zeroes_polar_rows():
    # a difference confined to the first/last latitude rows vanishes under
    # pole_mask=1 but not without it
    tar = np.zeros((1, 1, *SHAPE), dtype=np.float32)
    prd = np.zeros_like(tar)
    prd[..., 0, :] = 3.0
    prd[..., -1, :] = -3.0
    chw = jnp.ones((1, 1))

    masked = GeometricLpLoss(SHAPE, p=2, absolute=True, pole_mask=1)
    unmasked = GeometricLpLoss(SHAPE, p=2, absolute=True, pole_mask=0)
    assert float(masked(jnp.asarray(prd), jnp.asarray(tar), chw)) == 0.0
    assert float(unmasked(jnp.asarray(prd), jnp.asarray(tar), chw)) > 0.0


def test_lp_l1_absolute():
    # p=1 absolute loss of a constant difference is |d|
    tar = np.zeros((1, 1, *SHAPE), dtype=np.float32)
    prd = tar + 0.25
    chw = jnp.ones((1, 1))
    loss = GeometricLpLoss(SHAPE, p=1, absolute=True)
    np.testing.assert_allclose(float(loss(jnp.asarray(prd), jnp.asarray(tar), chw)),
                               0.25, rtol=1e-5)


# --------------------------------------------------------------------------
# LossHandler — spec-string parsing and channel weighting
# --------------------------------------------------------------------------

def _handler_params(tmp_path, loss_spec, n_ch=4, **overrides):
    params = ParamsBase()
    params.update_params({
        "loss": loss_spec,
        "n_future": 0,
        "img_shape_x": SHAPE[0],
        "img_shape_y": SHAPE[1],
        "img_crop_shape_x": SHAPE[0],
        "img_crop_shape_y": SHAPE[1],
        "img_crop_offset_x": 0,
        "img_crop_offset_y": 0,
        "N_out_channels": n_ch,
        "out_channels": list(range(n_ch)),
        "channel_names": ["u10m", "v10m", "sst", "z500"][:n_ch],
        "channel_weights": "auto",
        "model_grid_type": "equiangular",
        "dt": 4,
    })
    params.update_params(overrides)
    return params


@pytest.mark.parametrize("spec", [
    "l2", "geometric l2", "absolute geometric l2", "squared geometric l2",
    "pole-masked geometric l2", "l1", "geometric l1",
    "weighted geometric l2", "absolute geometric h1", "geometric h1",
    "squared absolute geometric h1",
])
def test_handler_spec_matrix_runs(tmp_path, spec):
    """Every spec-token combination in the reference's shipped configs
    parses and produces a finite positive loss."""
    params = _handler_params(tmp_path, spec)
    handler = LossHandler(params)
    rng = np.random.RandomState(0)
    prd = jnp.asarray(rng.randn(2, 4, *SHAPE).astype(np.float32))
    tar = jnp.asarray(rng.randn(2, 4, *SHAPE).astype(np.float32))
    val = float(handler(prd, tar, training=True))
    assert np.isfinite(val) and val > 0.0


def test_handler_weighted_zeroes_sst():
    """'weighted' + channel_weights=auto zeroes the sst channel (fork
    behavior, ref: makani/utils/losses.py:62-66): perturbing only sst
    leaves the loss at zero."""
    params = _handler_params(tmp_path=None, loss_spec="weighted absolute geometric l2")
    handler = LossHandler(params)
    tar = jnp.zeros((1, 4, *SHAPE), dtype=jnp.float32)
    prd = jnp.zeros((1, 4, *SHAPE)).at[:, 2].set(5.0)  # sst is channel 2
    assert float(handler(prd, tar, training=False)) == 0.0
    prd2 = jnp.zeros((1, 4, *SHAPE)).at[:, 0].set(5.0)
    assert float(handler(prd2, tar, training=False)) > 0.0


def test_handler_temp_std_weights(tmp_path):
    """temp-std channel weights = base/N * global_std/(sqrt(dt)*dstd + eps),
    squared when 'squared' is in the spec (ref: losses.py:118-131)."""
    n_ch = 4
    gstds = np.asarray([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    dstds = np.asarray([0.5, 1.0, 1.5, 2.0], dtype=np.float32)
    gpath = tmp_path / "global_stds.npy"
    dpath = tmp_path / "time_diff_stds.npy"
    np.save(gpath, gstds.reshape(1, n_ch, 1, 1))
    np.save(dpath, dstds.reshape(1, n_ch, 1, 1))

    for spec in ("temp-std geometric l2", "squared temp-std geometric l2"):
        params = _handler_params(
            tmp_path, spec,
            global_stds_path=str(gpath), time_diff_stds_path=str(dpath))
        handler = LossHandler(params)
        base = np.full(n_ch, 1.0 / n_ch, dtype=np.float32)
        tw = gstds / (np.sqrt(params.dt) * dstds + 1e-6)
        if "squared" in spec:
            tw = tw ** 2
        np.testing.assert_allclose(
            handler.channel_weights.reshape(-1), base * tw, rtol=1e-5)
