"""Preprocessor: everything between raw loader tensors and the network.

Functional re-design of ref: makani/models/preprocessor.py:30-427. The
reference mutates module state (cached unpredicted features, history stats);
under jit everything is pure: stats are returned values, the rolling
unpredicted-feature window is explicit carried state threaded by the steppers.

Responsibilities:
  - history flatten/expand (B,T,C,H,W) <-> (B,T*C,H,W)
  - static feature construction (grid / sinusoidal grid, orography, land-sea
    mask one-hot), sharded to the local spatial patch
  - unpredicted channel (zenith angle) append/roll per AR step
  - history normalization (none / mean / exponential / timediff)
  - residual-target learning scaled by time_diff_stds
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from makani_tpu.utils.grids import GridConverter


class Preprocessor2D:
    def __init__(self, params):
        self.n_history = params.n_history
        self.history_normalization_mode = params.history_normalization_mode if hasattr(params, "history_normalization_mode") else "none"
        if self.history_normalization_mode == "exponential":
            self.history_normalization_decay = params.history_normalization_decay
            # inverse ordering, since first element is oldest
            w = np.exp((-self.history_normalization_decay) * np.arange(self.n_history, -1, -1, dtype=np.float64))
            w = w / np.sum(w)
            self.history_normalization_weights = w.reshape(1, -1, 1, 1, 1).astype(np.float32)
        elif self.history_normalization_mode == "mean":
            w = np.full((self.n_history + 1,), 1.0 / (self.n_history + 1), dtype=np.float32)
            self.history_normalization_weights = w.reshape(1, -1, 1, 1, 1)
        else:
            self.history_normalization_weights = np.ones((self.n_history + 1,), dtype=np.float32)
        self.history_eps = 1e-6

        # residual normalization
        self.learn_residual = params.target == "residual"
        if self.learn_residual and params.get("normalize_residual", False):
            self.residual_scale = np.load(params.time_diff_stds_path).astype(np.float32)
        else:
            self.residual_scale = None

        # image shape (global)
        self.img_shape = (params.img_shape_x, params.img_shape_y)

        # crop window for static features. The reference slices each rank's
        # LOCAL patch (ref: preprocessor.py:75-78); under GSPMD the statics
        # are global in-graph arrays sharded by constraints, so the window is
        # the global crop (spatial ranks never see a "local" graph shape).
        start_x = params.get("img_crop_offset_x", 0)
        end_x = min(start_x + params.get("img_crop_shape_x", params.img_shape_x), params.img_shape_x)
        start_y = params.get("img_crop_offset_y", 0)
        end_y = min(start_y + params.get("img_crop_shape_y", params.img_shape_y), params.img_shape_y)

        static_features = None

        if params.get("add_grid", False):
            if hasattr(params, "lat") and hasattr(params, "lon") and params.lat is not None:
                lat = np.deg2rad(np.asarray(params.lat, dtype=np.float64))
                lon = np.deg2rad(np.asarray(params.lon, dtype=np.float64))
                gconv = GridConverter(
                    params.get("data_grid_type", "equiangular"),
                    params.get("model_grid_type", "equiangular"),
                    lat, lon,
                )
                tx, ty = gconv.get_dst_coords()
            else:
                tx = np.linspace(0, 1, params.img_shape_x + 1, dtype=np.float64)[:-1]
                ty = np.linspace(0, 1, params.img_shape_y + 1, dtype=np.float64)[:-1]

            x_grid, y_grid = np.meshgrid(tx, ty, indexing="ij")
            grid = np.stack([x_grid, y_grid], axis=0)[None].astype(np.float32)
            grid = grid[:, :, start_x:end_x, start_y:end_y]

            if params.get("gridtype", "linear") == "sinusoidal":
                num_freq = int(params.get("grid_num_frequencies", 1))
                singrid = np.concatenate(
                    [np.sin(freq * grid) for freq in range(1, num_freq + 1)], axis=1
                ).astype(np.float32)
                static_features = singrid
            else:
                static_features = grid

        if params.get("add_orography", False):
            from makani_tpu.utils.conditioning_inputs import get_orography

            oro = np.asarray(get_orography(params.orography_path), dtype=np.float64)
            oro = oro.reshape(1, 1, *oro.shape)
            eps = 1.0e-6
            # ddof=1: the reference z-scores with torch.std (unbiased),
            # ref: preprocessor.py:127-131
            oro = ((oro - oro.mean()) / (oro.std(ddof=1) + eps)).astype(np.float32)
            oro = oro[:, :, start_x:end_x, start_y:end_y]
            static_features = oro if static_features is None else np.concatenate([static_features, oro], axis=1)

        if params.get("add_landmask", False):
            from makani_tpu.utils.conditioning_inputs import get_land_mask

            lsm = np.asarray(get_land_mask(params.landmask_path)).astype(np.int64)
            nclasses = int(lsm.max()) + 1
            onehot = np.eye(nclasses, dtype=np.float32)[lsm]  # (H, W, nclasses)
            onehot = np.transpose(onehot, (2, 0, 1))[None]
            onehot = onehot[:, :, start_x:end_x, start_y:end_y]
            static_features = onehot if static_features is None else np.concatenate([static_features, onehot], axis=1)

        self.static_features = static_features  # numpy (1, Cs, Hloc, Wloc) or None
        self.do_add_static_features = static_features is not None
        self.n_static_features = 0 if static_features is None else static_features.shape[1]

    # --- history reshaping ---

    def flatten_history(self, x):
        if x.ndim == 5:
            b, t, c, h, w = x.shape
            x = x.reshape(b, t * c, h, w)
        return x

    def expand_history(self, x, nhist):
        if x.ndim == 4:
            b, ct, h, w = x.shape
            x = x.reshape(b, nhist, ct // nhist, h, w)
        return x

    # --- residual learning ---

    def add_residual(self, x, dx):
        """dx = model output; for residual learning add onto the latest history
        frame of x (ref: preprocessor.py:175-187)."""
        if not self.learn_residual:
            return dx
        if self.residual_scale is not None:
            dx = dx * jnp.asarray(self.residual_scale, dtype=dx.dtype)
        xe = self.expand_history(x, nhist=self.n_history + 1)
        xe = jnp.concatenate([xe[:, :-1], xe[:, -1:] + dx[:, None]], axis=1)
        return self.flatten_history(xe)

    # --- static features ---

    def add_static_features(self, x):
        if not self.do_add_static_features:
            return x
        static = jnp.asarray(self.static_features, dtype=x.dtype)
        static = jnp.broadcast_to(static, (x.shape[0],) + static.shape[1:])
        return jnp.concatenate([x, static], axis=1)

    def remove_static_features(self, x):
        if not self.do_add_static_features:
            return x
        return x[:, : x.shape[1] - self.n_static_features, :, :]

    # --- unpredicted (e.g. zenith) channels ---

    def append_channels(self, x, xc):
        """Interleave unpredicted channels per history frame
        (ref: preprocessor.py:242-255)."""
        xdim = x.ndim
        x = self.expand_history(x, self.n_history + 1)
        xc = self.expand_history(xc, self.n_history + 1)
        xo = jnp.concatenate([x, xc.astype(x.dtype)], axis=2)
        if xdim == 4:
            xo = self.flatten_history(xo)
        return xo

    def remove_unpredicted_features(self, x, n_unpredicted):
        if n_unpredicted == 0:
            return x
        xf = self.expand_history(x, nhist=self.n_history + 1)
        xc = xf[:, :, : xf.shape[2] - n_unpredicted, :, :]
        return self.flatten_history(xc)

    def advance_unpredicted(self, unpredicted_inp, unpredicted_tar, step):
        """Roll the unpredicted input window forward by one AR step, pulling
        the slice for `step` from the targets (ref: preprocessor.py:204-240).
        `step` must be a static python int."""
        if unpredicted_tar is None or unpredicted_inp is None:
            return unpredicted_inp
        if step >= unpredicted_tar.shape[1]:
            return unpredicted_inp
        utar = unpredicted_tar[:, step: step + 1]
        if self.n_history == 0:
            return utar
        return jnp.concatenate([unpredicted_inp[:, 1:], utar], axis=1)

    def advance_unpredicted_dyn(self, unpredicted_inp, unpredicted_tar, step):
        """advance_unpredicted with a *traced* step index, so one compiled
        AR-step program serves every rollout position (the reference pays no
        compile cost for its per-step python loop, ref: trainer.py:799-890;
        here the loop is on host over a single jitted step). Out-of-range
        steps clamp to the last target frame (jax dynamic_slice semantics) —
        rollouts never index past the target window."""
        if unpredicted_tar is None or unpredicted_inp is None:
            return unpredicted_inp
        utar = jax.lax.dynamic_slice_in_dim(unpredicted_tar, step, 1, axis=1)
        if self.n_history == 0:
            return utar
        return jnp.concatenate([unpredicted_inp[:, 1:], utar], axis=1)

    # --- history normalization ---

    def history_compute_stats(self, x):
        """Returns (mean, std) with shapes (B, C, 1, 1) (ref:
        preprocessor.py:257-320). Spatial psums are inserted by the parallel
        layer when the spatial axes are sharded."""
        mode = self.history_normalization_mode
        if mode in ("none", "timediff"):
            return (jnp.zeros((1, 1, 1, 1), jnp.float32), jnp.ones((1, 1, 1, 1), jnp.float32))

        xr = self.expand_history(x, self.n_history + 1).astype(jnp.float32)
        w = jnp.asarray(self.history_normalization_weights.reshape(1, -1, 1, 1, 1))

        mean = jnp.sum(xr * w, axis=(1, 3, 4), keepdims=True)
        mean = mean / float(self.img_shape[0] * self.img_shape[1])
        std = jnp.sum(jnp.square(xr - mean) * w, axis=(1, 3, 4), keepdims=True)
        std = jnp.sqrt(std / float(self.img_shape[0] * self.img_shape[1]))
        mean = jnp.squeeze(mean, axis=1)
        std = jnp.squeeze(std, axis=1)
        return (mean, std)

    def history_normalize(self, x, stats, target=False):
        if self.history_normalization_mode in ("none", "timediff"):
            return x
        mean, std = stats
        xdim = x.ndim
        xshape = x.shape
        if xdim == 5:
            x = self.flatten_history(x)
        if target:
            xn = (x - mean[:, : x.shape[1]]) / std[:, : x.shape[1]]
        else:
            hm = jnp.tile(mean, (1, self.n_history + 1, 1, 1))
            hs = jnp.tile(std, (1, self.n_history + 1, 1, 1))
            xn = (x - hm) / hs
        if xdim == 5:
            xn = xn.reshape(xshape)
        return xn

    def history_denormalize(self, xn, stats, target=False):
        if self.history_normalization_mode in ("none", "timediff"):
            return xn
        mean, std = stats
        xndim = xn.ndim
        xnshape = xn.shape
        if xndim == 5:
            xn = self.flatten_history(xn)
        if target:
            x = xn * std[:, : xn.shape[1]] + mean[:, : xn.shape[1]]
        else:
            hm = jnp.tile(mean, (1, self.n_history + 1, 1, 1))
            hs = jnp.tile(std, (1, self.n_history + 1, 1, 1))
            x = xn * hs + hm
        if xndim == 5:
            x = x.reshape(xnshape)
        return x

    # --- autoregressive history append ---

    def append_history(self, x1, x2):
        """Append prediction x2 to history window x1
        (ref: preprocessor.py:204-240, minus the unpredicted-state mutation
        which advance_unpredicted handles explicitly)."""
        if self.n_history > 0:
            x1 = self.expand_history(x1, nhist=self.n_history + 1)
            x2 = self.expand_history(x2, nhist=1)
            res = jnp.concatenate([x1[:, 1:], x2], axis=1)
            return self.flatten_history(res)
        return x2


def get_preprocessor(params):
    return Preprocessor2D(params)
