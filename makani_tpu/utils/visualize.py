"""Visualization: prediction/target comparison images, rollout metric plots,
and rollout videos.

Parity with ref: makani/utils/visualize.py:27-235 (mollweide pred/truth
comparisons rendered in a process pool, rollout ACC/RMSE curve plots saved
per channel, rollout animations). moviepy/ffmpeg are unavailable in this
environment, so videos are written as MJPEG-AVI (hand-rolled RIFF container
around PIL JPEG frames — playable everywhere) with an animated-GIF fallback.
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

    def add_video(self, tag, pred_frames, targ_frames, fps=4, fmt="avi"):
        """Async side-by-side rollout animation ([T, H, W] frames, one
        channel) — the reference's moviepy video export equivalent."""
        out_path = os.path.join(self.out_dir, f"{tag}.{fmt}")
        self.futures.append(self.executor.submit(
            render_rollout_video, np.asarray(pred_frames), np.asarray(targ_frames),
            out_path, fps))

    def finalize(self):
        paths = [f.result() for f in self.futures]
        self.futures = []
        return paths


def _colorize(field, vmin, vmax, cmap="twilight_shifted"):
    """Map a 2D field to uint8 RGB via a matplotlib colormap."""
    import matplotlib
    matplotlib.use("Agg")

    norm = np.clip((field - vmin) / max(vmax - vmin, 1e-12), 0.0, 1.0)
    rgba = matplotlib.colormaps[cmap](norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def write_mjpeg_avi(frames, out_path, fps=4, quality=90):
    """Write uint8 RGB frames [T, H, W, 3] as an MJPEG AVI.

    Pure-Python RIFF/AVI container with PIL-encoded JPEG frames — the
    no-ffmpeg/no-moviepy replacement for the reference's video export
    (ref: makani/utils/visualize.py rollout animations).
    """
    import io
    import struct
    from PIL import Image

    frames = np.asarray(frames)
    T, H, W = frames.shape[:3]

    encoded = []
    for t in range(T):
        buf = io.BytesIO()
        Image.fromarray(frames[t]).save(buf, format="JPEG", quality=quality)
        # store the UNPADDED payload: RIFF chunk sizes must exclude the
        # odd-length pad byte, which chunk() appends outside the recorded
        # length (strict parsers reject sizes that include padding)
        encoded.append(buf.getvalue())
    max_size = max(len(d) for d in encoded)

    def chunk(fourcc, payload):
        return fourcc + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")

    def lst(fourcc, payload):
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack("<14I", int(1e6 / fps), max_size * fps, 0, 0x10, T, 0, 1, max_size, W, H, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, T, max_size, 0xFFFFFFFF, 0, 0, 0, W, H)
    strf = struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 24, b"MJPG", W * H * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", d) for d in encoded)
    movi = lst(b"movi", movi_payload)

    idx, offset = b"", 4
    for d in encoded:
        size = len(d)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, size)
        offset += 8 + size + (size % 2)
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(out_path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
    return out_path


def write_gif(frames, out_path, fps=4):
    """Animated-GIF fallback writer (uint8 RGB frames [T, H, W, 3])."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in np.asarray(frames)]
    imgs[0].save(out_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return out_path


def render_rollout_video(pred, targ, out_path, fps=4, cmap="twilight_shifted"):
    """Side-by-side prediction|target rollout animation for one channel.

    pred/targ: [T, H, W] arrays. Container picked from the file extension
    (.avi -> MJPEG, .gif -> GIF). Ref capability: makani rollout videos.
    """
    pred, targ = np.asarray(pred), np.asarray(targ)
    vmin = float(min(pred.min(), targ.min()))
    vmax = float(max(pred.max(), targ.max()))
    frames = []
    for t in range(pred.shape[0]):
        left = _colorize(pred[t], vmin, vmax, cmap)
        right = _colorize(targ[t], vmin, vmax, cmap)
        sep = np.zeros((left.shape[0], 4, 3), np.uint8)
        frames.append(np.concatenate([left, sep, right], axis=1))
    if out_path.endswith(".gif"):
        return write_gif(frames, out_path, fps=fps)
    return write_mjpeg_avi(frames, out_path, fps=fps)


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
