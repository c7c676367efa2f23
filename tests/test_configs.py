"""Every shipped experiment config parses and builds its model
(config/*.yaml families mirror ref config/{sfnonet,icml_models,afnonet,vit}.yaml)."""

import glob
import os

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from testutils import get_default_parameters

from makani_tpu.utils.yparams import YParams
from makani_tpu.models import model_registry

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")


def _all_configs():
    out = []
    for path in sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))):
        with open(path) as f:
            doc = yaml.safe_load(f)
        for name in doc:
            if name != "base_config":
                out.append((os.path.basename(path), name))
    return out


@pytest.mark.parametrize("fname,config", _all_configs())
def test_config_parses(fname, config):
    params = YParams(os.path.join(CONFIG_DIR, fname), config)
    assert params.nettype in ("SFNO", "FNO", "AFNO", "AFNOv1", "ViT", "DebugNet")
    assert params.batch_size >= 1
    # "None" strings sanitized to real None (ref: YParams.py:62-63)
    assert params.get("maskpath", None) in (None, "") or "None" not in str(params.maskpath)


@pytest.mark.parametrize("fname,config", [
    ("sfnonet.yaml", "sfno_linear_73chq_sc3_layers8_edim384_wstgl2"),
    ("sfnonet.yaml", "base_73chq_finetune"),
    ("icml_models.yaml", "sfno_dhealy_26ch"),
    ("icml_models.yaml", "sfno_nonlinear_26ch"),
    ("icml_models.yaml", "fno_linear_26ch"),
    ("icml_models.yaml", "fno_nonlinear_73ch"),
    ("icml_models.yaml", "sfno_dhealy_73ch_edim768"),
    ("afnonet.yaml", "afno_backbone"),
    ("afnonet.yaml", "afno_v2"),
    ("vit.yaml", "vit_backbone"),
])
def test_config_builds_model(fname, config):
    """Hyperparameters from the config drive a real (tiny-grid) model build
    + one forward pass."""
    params = YParams(os.path.join(CONFIG_DIR, fname), config)

    defaults = get_default_parameters()
    for k in defaults.params:
        if k not in params:
            params[k] = defaults[k]

    # shrink to a test grid; keep the architecture knobs from the config
    nch = 3
    params.update_params({
        "img_shape_x": 32, "img_shape_y": 64,
        "img_crop_shape_x": 32, "img_crop_shape_y": 64,
        "img_crop_offset_x": 0, "img_crop_offset_y": 0,
        "N_in_channels": nch, "N_out_channels": nch,
        "embed_dim": 16, "num_layers": 2, "depth": 2, "num_heads": 2,
        "patch_size": (8, 8),
        "add_zenith": False, "add_grid": False,
        "add_orography": False, "add_landmask": False,
    })
    model = model_registry.get_model(params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, nch, 32, 64).astype(np.float32))
    import jax
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, nch, 32, 64)
    assert np.isfinite(np.asarray(y)).all()
