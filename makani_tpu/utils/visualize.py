"""Visualization: prediction/target comparison images + rollout metric plots.

Parity with ref: makani/utils/visualize.py:27-235 (mollweide pred/truth
comparisons rendered in a process pool, rollout ACC/RMSE curve plots saved
per channel). Video export is omitted (moviepy unavailable); frames are saved
as pngs that compose into animations offline.
"""

import logging
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

logger = logging.getLogger(__name__)


def _render_comparison(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tag, pred, targ, out_path, projection = args
    nchan = pred.shape[0]
    fig, axes = plt.subplots(nchan, 2, figsize=(10, 3 * nchan),
                             subplot_kw={"projection": projection} if projection else None,
                             squeeze=False)
    for c in range(nchan):
        for col, (name, field) in enumerate([("prediction", pred[c]), ("target", targ[c])]):
            ax = axes[c][col]
            if projection:
                nlat, nlon = field.shape
                lons = np.linspace(-np.pi, np.pi, nlon)
                lats = np.linspace(np.pi / 2, -np.pi / 2, nlat)
                Lon, Lat = np.meshgrid(lons, lats)
                im = ax.pcolormesh(Lon, Lat, field, cmap="twilight_shifted", rasterized=True)
                ax.set_axis_off()
            else:
                im = ax.imshow(field, cmap="twilight_shifted")
            ax.set_title(f"{name} c{c}")
            fig.colorbar(im, ax=ax, shrink=0.7)
    fig.suptitle(tag)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


class VisualizationWrapper:
    """Async rendering of pred/truth comparisons (ref: visualize.py:27-120)."""

    def __init__(self, params, path_suffix="visualizations", num_workers=1, projection="mollweide"):
        self.out_dir = os.path.join(params.experiment_dir, path_suffix)
        os.makedirs(self.out_dir, exist_ok=True)
        self.projection = projection
        self.executor = ProcessPoolExecutor(max_workers=num_workers)
        self.futures = []

    def add(self, tag, pred, targ):
        out_path = os.path.join(self.out_dir, f"{tag}.png")
        self.futures.append(self.executor.submit(
            _render_comparison, (tag, np.asarray(pred), np.asarray(targ), out_path, self.projection)))

    def finalize(self):
        paths = [f.result() for f in self.futures]
        self.futures = []
        return paths


def plot_rollout_metrics(acc_curves, rmse_curves, params, epoch=0, model_name="model"):
    """Per-channel rollout curve plots (ref: visualize.py:150-235)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = os.path.join(params.experiment_dir, "rollout_plots")
    os.makedirs(out_dir, exist_ok=True)

    acc = np.asarray(acc_curves)
    rmse = np.asarray(rmse_curves)
    dtxdh = params.dt * params.dhours
    hours = dtxdh * (1 + np.arange(acc.shape[1]))
    channel_names = list(params.channel_names)

    paths = []
    for c in range(acc.shape[0]):
        name = channel_names[c] if c < len(channel_names) else f"ch{c}"
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        ax1.plot(hours, acc[c], marker="o")
        ax1.set_xlabel("lead time [h]")
        ax1.set_ylabel("ACC")
        ax1.set_ylim(0, 1.05)
        ax1.grid(True, alpha=0.3)
        ax2.plot(hours, rmse[c], marker="o", color="tab:red")
        ax2.set_xlabel("lead time [h]")
        ax2.set_ylabel("RMSE")
        ax2.grid(True, alpha=0.3)
        fig.suptitle(f"{model_name} rollout: {name} (epoch {epoch})")
        fig.tight_layout()
        path = os.path.join(out_dir, f"rollout_{name}_epoch{epoch}.png")
        fig.savefig(path, dpi=100)
        plt.close(fig)
        paths.append(path)
    return paths
