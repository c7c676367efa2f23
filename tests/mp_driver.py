"""Multi-process training driver for tests/test_multiprocess.py.

Runs a tiny SFNO training epoch either as a single process owning N virtual
CPU devices or as one rank of an N-process cluster (1 device per process),
then dumps the final train/validation losses as JSON. The parity test
asserts both layouts produce the same losses — the gate on the framework's
multi-host (pod) claims (ref semantics: makani/utils/dataloader.py:27-60 +
trainer.py:712-797 rank-local DDP feeding).
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=1)
    ap.add_argument("--port", type=int, default=12355)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--model-parallel-sizes", type=str, default="1,1,1,1",
                    help="h,w,fin,fout — h>1 with 2 processes exercises the "
                         "io-sharded spatial read path")
    ap.add_argument("--data-dir", type=str, default=None,
                    help="dataset dir written by testutils.init_dataset; "
                         "when set, uses the file-backed MultifilesDataset "
                         "instead of synthetic data")
    args = ap.parse_args()
    mp_sizes = [int(s) for s in args.model_parallel_sizes.split(",")]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}")

    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from testutils import get_default_parameters, set_dataset_paths

    from makani_tpu.parallel import comm
    from makani_tpu.utils.trainer import Trainer

    comm.init(model_parallel_sizes=mp_sizes)
    n_model = 1
    for s in mp_sizes:
        n_model *= s
    assert comm.get_size("data") * n_model == args.num_processes * args.devices_per_process

    params = get_default_parameters()
    params.nettype = "SFNO"
    params.update_params({
        "embed_dim": 16, "num_layers": 2, "scale_factor": 2,
        "use_mlp": True, "mlp_ratio": 2.0, "activation_function": "gelu",
        "pos_embed": "none", "operator_type": "dhconv", "filter_type": "linear",
        "normalization_layer": "instance_norm", "loss": "geometric l2",
        "lr": 1e-3, "batch_size": 1, "max_epochs": 1,
        "n_train_samples_per_epoch": 8, "n_eval_samples": 4,
        "valid_autoreg_steps": 0, "scheduler": "none",
        "optimizer_type": "Adam", "save_checkpoint": "none",
        "enable_synthetic_data": args.data_dir is None,
        "img_shape_x": 16, "img_shape_y": 32,
        "enable_auto_layouts": False,
        "global_seed": 333,
    })
    if args.data_dir is not None:
        # file-backed MultifilesDataset over a pre-written shared dataset:
        # with h spanning processes this activates io-sharded subwindow
        # reads (init_distributed_io) + the global-array assembly in
        # Trainer._device_batch (ref: makani/utils/dataloader.py:27-60,
        # dali_es_helper_2d.py:276-285)
        set_dataset_paths(args.data_dir, params)
        params["num_data_workers"] = 1
    else:
        # synthetic data: no files needed, but stats paths must exist as keys
        params.train_data_path = "/nonexistent"
        params.valid_data_path = "/nonexistent"

    trainer = Trainer(params, world_rank=comm.get_world_rank())
    trainer.train()

    train_loss = trainer._last_train_loss
    valid_loss = trainer.metrics.logs["base"]["validation loss"]

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump({"train_loss": float(train_loss),
                       "valid_loss": float(valid_loss),
                       "iters": trainer.iters,
                       "io_grid": list(params.get("io_grid", [1, 1, 1]))}, f)


if __name__ == "__main__":
    main()
