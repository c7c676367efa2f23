"""Self-contained inference model packages.

Parity with ref: makani/models/model_package.py:40-268. An experiment dir is a
complete inference package: config.json (human-readable params), copies of
orography/landmask and normalization stats, metadata.json entrypoint, and the
best checkpoint. ``load_model_package`` reconstructs the serial model;
``ModelWrapper`` appends the zenith-angle channel computed from wall-clock
time so external consumers only pass (fields, time).
"""

import json
import logging
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.utils.yparams import ParamsBase
from makani_tpu.utils.zenith_angle import cos_zenith_angle
from makani_tpu.models import model_registry
from makani_tpu.utils import checkpoint as ckpt_lib

logger = logging.getLogger(__name__)

THIS_MODULE = "makani_tpu.models.model_package"
MODEL_PACKAGE_CHECKPOINT_PATH = "training_checkpoints/best_ckpt"
MINS_FILE = "mins.npy"
MAXS_FILE = "maxs.npy"
MEANS_FILE = "global_means.npy"
STDS_FILE = "global_stds.npy"


class LocalPackage:
    """(ref: model_package.py:34-45)."""

    def __init__(self, root):
        self.root = root

    def get(self, path):
        return os.path.join(self.root, path)


class ModelWrapper:
    """Inference-simple wrapper: forward(x, time) appends the zenith channel
    (ref: model_package.py:58-96)."""

    def __init__(self, model, model_params, params):
        self.model = model
        self.model_params = model_params
        self.params = params
        nlat = params.img_shape_x
        nlon = params.img_shape_y
        self.lats = 90 - 180 * np.arange(nlat) / (nlat - 1)
        self.lons = 360 * np.arange(nlon) / nlon
        self.add_zenith = params.get("add_zenith", False)
        self._fwd = jax.jit(lambda p, x, z: self.model.apply(
            {"params": p}, x, unpredicted_inp=z, deterministic=True))

    def __call__(self, x, time):
        z = None
        if self.add_zenith:
            lon_grid, lat_grid = np.meshgrid(self.lons, self.lats)
            cosz = cos_zenith_angle(time, lon_grid, lat_grid).astype(np.float32)
            n_hist = self.params.n_history + 1
            z = jnp.asarray(cosz).reshape(1, 1, 1, *cosz.shape[-2:])
            z = jnp.broadcast_to(z, (x.shape[0], n_hist, 1, *cosz.shape[-2:]))
        return self._fwd(self.model_params, x, z)


def save_model_package(params):
    """(ref: model_package.py:99-137)."""
    os.makedirs(params.experiment_dir, exist_ok=True)
    config_path = os.path.join(params.experiment_dir, "config.json")
    with open(config_path, "w") as f:
        json.dump({k: v for k, v in params.to_dict().items()
                   if not k.startswith("_")}, f, indent=2, default=str)

    if params.get("add_orography", False):
        shutil.copy(params.orography_path, os.path.join(params.experiment_dir, "orography.nc"))
    if params.get("add_landmask", False):
        shutil.copy(params.landmask_path, os.path.join(params.experiment_dir, "land_mask.nc"))

    if params.get("global_means_path", None):
        shutil.copy(params.global_means_path, os.path.join(params.experiment_dir, MEANS_FILE))
    if params.get("global_stds_path", None):
        shutil.copy(params.global_stds_path, os.path.join(params.experiment_dir, STDS_FILE))
    if params.normalization == "minmax":
        if params.get("min_path", None):
            shutil.copy(params.min_path, os.path.join(params.experiment_dir, MINS_FILE))
        if params.get("max_path", None):
            shutil.copy(params.max_path, os.path.join(params.experiment_dir, MAXS_FILE))

    metadata = {"entrypoint": {"name": f"{THIS_MODULE}:load_time_loop"}}
    with open(os.path.join(params.experiment_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)


def _load_static_data(package, params):
    """(ref: model_package.py:140-159)."""
    if params.get("add_orography", False):
        params.orography_path = package.get("orography.nc")
    if params.get("add_landmask", False):
        params.landmask_path = package.get("land_mask.nc")

    if params.normalization == "zscore":
        if params.get("global_means_path", None):
            params.global_means_path = package.get(MEANS_FILE)
        if params.get("global_stds_path", None):
            params.global_stds_path = package.get(STDS_FILE)
    elif params.normalization == "minmax":
        if params.get("min_path", None):
            params.min_path = package.get(MINS_FILE)
        if params.get("max_path", None):
            params.max_path = package.get(MAXS_FILE)
    elif params.normalization != "none":
        raise ValueError("Unknown normalization mode.")


def load_model_package(package, pretrained=True):
    """Load a package for inference; returns a ModelWrapper
    (ref: model_package.py:162-196)."""
    if isinstance(package, str):
        package = LocalPackage(package)

    params = ParamsBase.from_json(package.get("config.json"))
    _load_static_data(package, params)

    # serial layout (checkpoints reshard automatically)
    params.img_local_offset_x = 0
    params.img_local_offset_y = 0
    params.img_local_shape_x = params.img_shape_x
    params.img_local_shape_y = params.img_shape_y

    model = model_registry.get_model(params)

    n_pred_chans = len(params.in_channels)
    init_inp = jnp.zeros((1, (params.n_history + 1) * n_pred_chans,
                          params.img_shape_x, params.img_shape_y), jnp.float32)
    init_zen = None
    if params.get("add_zenith", False):
        init_zen = jnp.zeros((1, params.n_history + 1, 1,
                              params.img_shape_x, params.img_shape_y), jnp.float32)
    variables = jax.jit(lambda key: model.init(
        key, init_inp, unpredicted_inp=init_zen, deterministic=True))(jax.random.PRNGKey(0))
    model_params = variables["params"]

    if pretrained:
        model_params, _, _ = ckpt_lib.restore_checkpoint(
            package.get(MODEL_PACKAGE_CHECKPOINT_PATH), model_params, None)

    return ModelWrapper(model, model_params, params)


class TimeLoop:
    """Minimal earth2mip-style time loop: encapsulates normalization and
    autoregressive stepping so external frameworks only see physical fields
    and wall-clock times (ref: model_package.py:199-268, which wraps the
    model in earth2mip.networks.Inference; this is a dependency-free
    equivalent with the same iteration contract).

    Calling ``loop(x, time)`` with physical-unit fields
    x: (batch, n_history+1, n_channels, nlat, nlon) yields an infinite
    sequence of (time, fields) starting with the initial condition itself.
    """

    def __init__(self, wrapper, center, scale, channel_names, time_step):
        self.wrapper = wrapper
        self.center = np.asarray(center, np.float32).reshape(1, 1, -1, 1, 1)
        self.scale = np.asarray(scale, np.float32).reshape(1, 1, -1, 1, 1)
        self.in_channel_names = self.out_channel_names = list(channel_names)
        self.time_step = time_step
        p = wrapper.params
        self.n_history = p.n_history
        self.grid_shape = (p.img_shape_x, p.img_shape_y)

    def __call__(self, x, time):
        x = (np.asarray(x, np.float32) - self.center) / self.scale
        b, t, c, h, w = x.shape
        while True:
            yield time, x[:, -1] * self.scale[:, 0] + self.center[:, 0]
            flat = jnp.asarray(x.reshape(b, t * c, h, w))
            pred = np.asarray(self.wrapper(flat, time))
            # roll the history window forward with the new prediction
            x = np.concatenate([x[:, 1:], pred.reshape(b, 1, c, h, w)], axis=1)
            time = time + self.time_step


def load_time_loop(package, time_step_hours=None):
    """Load a package as a TimeLoop (the metadata.json entrypoint;
    ref: model_package.py:199-268)."""
    import datetime

    if isinstance(package, str):
        package = LocalPackage(package)

    params = ParamsBase.from_json(package.get("config.json"))
    if params.in_channels != params.out_channels:
        raise NotImplementedError("TimeLoop requires equal input/output channels")
    names = [params.channel_names[i] for i in params.in_channels]

    if params.normalization == "minmax":
        lo = np.squeeze(np.load(package.get(MINS_FILE)))[params.in_channels]
        hi = np.squeeze(np.load(package.get(MAXS_FILE)))[params.in_channels]
        # match the TRAINING normalization: loaders map minmax to [0, 1]
        # via (x - min) / (max - min) (data/dataset.py:68). The reference's
        # earth2mip path instead maps to [-1, 1] (ref: model_package.py:206)
        # — a bug-for-bug mismatch with its own training loaders, fixed here.
        center, scale = lo, hi - lo
    else:
        center = np.squeeze(np.load(package.get(MEANS_FILE)))[params.in_channels]
        scale = np.squeeze(np.load(package.get(STDS_FILE)))[params.in_channels]

    wrapper = load_model_package(package, pretrained=True)
    hours = time_step_hours if time_step_hours is not None else params.get("dt", 6)
    return TimeLoop(wrapper, center, scale, names, datetime.timedelta(hours=int(hours)))
