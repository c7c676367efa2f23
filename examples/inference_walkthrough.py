"""Inferencer walkthrough — the script analog of the reference's
notebooks/inference.ipynb "Using Inferencer" section (ref:
/root/reference/notebooks/inference.ipynb).

Flow: build params from a training config, point them at a dataset, stand up
the Inferencer, run a scored autoregressive rollout from one initial
condition, and plot the ACC curve + a prediction/target comparison.

Quick synthetic end-to-end:

    python makani_tpu/tools/make_synthetic_dataset.py --output ./datasets/synthetic
    MAKANI_PLATFORM=cpu python -m makani_tpu.train \
        --yaml_config config/sfnonet.yaml --config smoke_test
    MAKANI_PLATFORM=cpu python examples/inference_walkthrough.py \
        --yaml_config config/sfnonet.yaml --config smoke_test
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    # 1) params from the training recipe (the notebook's YParams step)
    from makani_tpu.parallel import comm
    from makani_tpu.utils.yparams import YParams
    from makani_tpu.utils.dataset_metadata import parse_dataset_metadata

    params = YParams(os.path.abspath(args.yaml_config), args.config)
    params["model_parallel_sizes"] = [1, 1, 1, 1]
    params["model_parallel_names"] = ["h", "w", "fin", "fout"]
    comm.init(model_parallel_sizes=params["model_parallel_sizes"],
              model_parallel_names=params["model_parallel_names"])
    params["world_size"] = comm.get_world_size()
    params["global_batch_size"] = params.batch_size = 1
    params["resuming"] = False
    params["n_future"] = 0
    params["amp_mode"] = "none"
    params["log_to_wandb"] = False
    params["experiment_dir"] = os.path.abspath(args.experiment_dir or os.path.join(
        params.exp_dir, args.config, "00"))
    params["checkpoint_path"] = os.path.join(
        params["experiment_dir"], "training_checkpoints", "best_ckpt")
    params, _ = parse_dataset_metadata(params["metadata_json_path"], params=params)

    # the inferencer scores against the out-of-sample split
    params["inf_data_path"] = params.get("inf_data_path", params["valid_data_path"])
    params["valid_autoreg_steps"] = args.steps

    # 2) the Inferencer itself (the notebook's `Inferencer(params, world_rank=0)`)
    from makani_tpu.utils.inferencer import Inferencer

    inferencer = Inferencer(params, world_rank=0)

    # 3) channels to analyze, by name where available
    names = list(params.get("channel_names", []))
    wanted = [c for c in args.channels.split(",") if c]
    output_channels = [names.index(c) for c in wanted if c in names] or [0, 1]
    print("channels:", [names[i] if i < len(names) else i for i in output_channels])

    # 4) scored rollout from one initial condition
    truth, pred = inferencer.inference_single(
        ic=args.ic, output_data=True, output_channels=output_channels,
        compute_metrics=True)
    logs = inferencer.metrics.logs
    print("rollout shapes: truth", truth.shape, "pred", pred.shape)
    scalars = {k: v for k, v in logs.get("metrics", {}).items()
               if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
    for k, v in sorted(scalars.items())[:8]:
        print(f"  {k}: {float(v):.4f}")

    # 5) plots (the notebook's matplotlib cells)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = os.path.join(params["experiment_dir"], "walkthrough")
    os.makedirs(out_dir, exist_ok=True)

    dh = float(params.get("dhours", 6)) * float(params.get("dt", 1))
    t = np.arange(pred.shape[0]) * dh
    err = np.sqrt(((pred - truth) ** 2).mean(axis=(-2, -1)))[:, 0, 0]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(t, err, marker="o")
    ax.set_xlabel("lead time [h]")
    ax.set_ylabel("RMSE (normalized units)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "rmse_curve.png"), dpi=110)

    fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
    a1.imshow(pred[-1, 0, 0], cmap="twilight_shifted")
    a1.set_title("prediction (final step)")
    a2.imshow(truth[-1, 0, 0], cmap="twilight_shifted")
    a2.set_title("target")
    for a in (a1, a2):
        a.set_axis_off()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "comparison.png"), dpi=110)
    print("wrote plots to", out_dir)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--yaml_config", default="config/sfnonet.yaml")
    p.add_argument("--config", default="smoke_test")
    p.add_argument("--experiment_dir", default=None)
    p.add_argument("--ic", type=int, default=0)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--channels", default="u10m,v10m")
    main(p.parse_args())
