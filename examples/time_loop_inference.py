"""Model-package inference demo (the reference's notebooks/inference.ipynb
workflow, ref: notebooks/inference.ipynb): load a trained experiment dir as a
TimeLoop and roll a forecast forward from an initial condition.

Run against any experiment directory produced by `makani_tpu.train` (for a
quick synthetic one, train the `smoke_test` config first):

    python makani_tpu/tools/make_synthetic_dataset.py --output ./datasets/synthetic
    MAKANI_PLATFORM=cpu python -m makani_tpu.train \
        --yaml_config config/sfnonet.yaml --config smoke_test
    MAKANI_PLATFORM=cpu python examples/time_loop_inference.py \
        --package runs/sfnonet/smoke_test/0 --steps 4
"""

import argparse
import datetime

import numpy as np


def main(args):
    from makani_tpu.models.model_package import load_time_loop

    loop = load_time_loop(args.package)
    nlat, nlon = loop.grid_shape
    nchan = len(loop.in_channel_names)
    print(f"package: {nchan} channels {loop.in_channel_names[:8]}... "
          f"grid {nlat}x{nlon}, dt={loop.time_step}")

    # initial condition: random physical-unit fields unless an .npy is given
    if args.ic:
        x = np.load(args.ic).reshape(1, loop.n_history + 1, nchan, nlat, nlon)
    else:
        x = np.random.RandomState(0).randn(
            1, loop.n_history + 1, nchan, nlat, nlon).astype(np.float32)

    time = datetime.datetime.fromisoformat(args.start_time)
    it = loop(x, time)
    for _ in range(args.steps + 1):
        t, fields = next(it)
        stats = {name: float(np.sqrt(np.mean(fields[0, i] ** 2)))
                 for i, name in enumerate(loop.in_channel_names[:4])}
        print(f"{t.isoformat()}  rms: " +
              "  ".join(f"{k}={v:.3f}" for k, v in stats.items()))
        if args.output:
            np.save(f"{args.output}_{t:%Y%m%d%H}.npy", fields)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--package", required=True, help="Experiment/package directory.")
    p.add_argument("--steps", type=int, default=4, help="Autoregressive steps.")
    p.add_argument("--start_time", default="2020-01-01T00:00:00+00:00")
    p.add_argument("--ic", default=None, help="Optional .npy initial condition (physical units).")
    p.add_argument("--output", default=None, help="Optional output .npy prefix per step.")
    main(p.parse_args())
