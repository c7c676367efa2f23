"""Training CLI (parity with ref: makani/train.py:33-183).

Usage:
    python -m makani_tpu.train --yaml_config config/sfnonet.yaml --config <name> \
        [--h_parallel_size N --w_parallel_size N --fin_parallel_size N --fout_parallel_size N] \
        [--amp_mode bf16] [--multistep_count K] [--mode train|test]
"""

import argparse
import logging
import os

from makani_tpu.parallel import comm
from makani_tpu.utils import logging_utils
from makani_tpu.utils.yparams import YParams
from makani_tpu.utils.dataset_metadata import parse_dataset_metadata
from makani_tpu.utils.checkpoint import checkpoint_exists


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fin_parallel_size", default=1, type=int, help="Input feature paralellization")
    parser.add_argument("--fout_parallel_size", default=1, type=int, help="Output feature paralellization")
    parser.add_argument("--h_parallel_size", default=1, type=int, help="Spatial parallelism dimension in h")
    parser.add_argument("--w_parallel_size", default=1, type=int, help="Spatial parallelism dimension in w")
    parser.add_argument("--run_num", default="00", type=str)
    parser.add_argument("--yaml_config", default="./config/sfnonet.yaml", type=str)
    parser.add_argument("--config", default="base_73chq", type=str)
    parser.add_argument("--batch_size", default=-1, type=int, help="Override global batch size")
    parser.add_argument("--enable_synthetic_data", action="store_true")
    parser.add_argument("--amp_mode", default="none", type=str, choices=["none", "fp16", "bf16"])
    parser.add_argument("--checkpointing_level", default=0, type=int, help="How aggressively activation checkpointing (remat) is used")
    parser.add_argument("--print_timings_frequency", default=-1, type=int)
    parser.add_argument("--skip_validation", action="store_true")
    parser.add_argument("--mode", default="train", type=str, choices=["train", "test"])
    parser.add_argument("--profile", default=0, type=int,
                        help="Capture a jax profiler trace of the first N training steps "
                             "(the TPU-native equivalent of train_profile.py's nsys windows)")
    parser.add_argument("--save_checkpoint", default="flexible", choices=["none", "flexible", "legacy"], type=str)
    parser.add_argument("--load_checkpoint", default="flexible", choices=["flexible", "legacy"], type=str)
    parser.add_argument("--multistep_count", default=1, type=int)
    parser.add_argument("--enable_odirect", action="store_true",
                        help="O_DIRECT reads in the native data plane (ref: dali_es_helper_2d.py:104)")
    parser.add_argument("--enable_benchy", action="store_true",
                        help="Wrap the train loader in a throughput benchmark (ref: dataloader.py:140-143)")
    parser.add_argument("--enable_grad_anomaly_detection", action="store_true",
                        help="Trap NaN/Inf in the training step (jax_debug_nans; "
                             "ref: torch.autograd.set_detect_anomaly, train.py:113-114)")
    parser.add_argument("--split_data_channels", action="store_true",
                        help="Shard data channels over the matmul group (ref: train.py:51)")
    parser.add_argument("--epsilon_factor", default=0, type=float,
                        help="Optimizer eps = 1e-8 * 10**epsilon_factor (the reference parses "
                             "this flag without consuming it; here it scales Adam/AdamW eps)")
    # accepted for reference CLI compatibility; capabilities are jit-native
    parser.add_argument("--jit_mode", default="none", type=str,
                        help="no-op: every step is XLA-compiled (ref jit_mode none|script|inductor)")
    parser.add_argument("--cuda_graph_mode", default="none", type=str,
                        help="no-op: jit gives whole-step graph capture (ref cuda_graph_mode)")
    parser.add_argument("--disable_ddp", action="store_true",
                        help="no-op: gradient reduction is part of the partitioned step")
    parser.add_argument("--parameters_reduction_buffer_count", default=1, type=int,
                        help="no-op: no DDP bucketing under GSPMD")
    args = parser.parse_args()

    params = YParams(os.path.abspath(args.yaml_config), args.config)

    params["fin_parallel_size"] = args.fin_parallel_size
    params["fout_parallel_size"] = args.fout_parallel_size
    params["h_parallel_size"] = args.h_parallel_size
    params["w_parallel_size"] = args.w_parallel_size
    params["model_parallel_sizes"] = [args.h_parallel_size, args.w_parallel_size,
                                      args.fin_parallel_size, args.fout_parallel_size]
    params["model_parallel_names"] = ["h", "w", "fin", "fout"]

    params["load_checkpoint"] = args.load_checkpoint
    params["save_checkpoint"] = args.save_checkpoint

    world_rank = comm.init(model_parallel_sizes=params["model_parallel_sizes"],
                           model_parallel_names=params["model_parallel_names"],
                           verbose=False)

    params["world_size"] = comm.get_world_size()
    if args.batch_size > 0:
        params.batch_size = args.batch_size
    params["global_batch_size"] = params.batch_size
    assert params["global_batch_size"] % comm.get_size("data") == 0, (
        f"Error, cannot evenly distribute {params['global_batch_size']} across "
        f"{comm.get_size('data')} devices.")
    params["batch_size"] = int(params["global_batch_size"] // comm.get_size("data"))

    if "optimizer_max_grad_norm" not in params:
        params["optimizer_max_grad_norm"] = 1.0

    # experiment dir
    exp_dir = os.path.join(params.exp_dir, args.config, str(args.run_num))
    if world_rank == 0:
        if not os.path.isdir(exp_dir):
            os.makedirs(exp_dir, exist_ok=True)
            os.makedirs(os.path.join(exp_dir, "training_checkpoints"), exist_ok=True)

    params["experiment_dir"] = os.path.abspath(exp_dir)
    params["checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "ckpt")
    params["best_checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "best_ckpt")

    # resume detection by checkpoint presence (ref: train.py:129-136)
    params["resuming"] = checkpoint_exists(params["checkpoint_path"])

    params["amp_mode"] = args.amp_mode
    params["skip_validation"] = args.skip_validation
    params["checkpointing"] = args.checkpointing_level
    params["enable_synthetic_data"] = args.enable_synthetic_data
    params["print_timings_frequency"] = args.print_timings_frequency
    params["multistep_count"] = args.multistep_count
    params["n_future"] = args.multistep_count - 1
    params["profile_steps"] = args.profile
    params["enable_odirect"] = args.enable_odirect
    params["enable_benchy"] = args.enable_benchy
    params["enable_grad_anomaly_detection"] = args.enable_grad_anomaly_detection
    params["split_data_channels"] = args.split_data_channels
    params["epsilon_factor"] = args.epsilon_factor

    if world_rank == 0:
        logging_utils.config_logger()
        logging_utils.log_to_file(logger_name=None, log_filename=os.path.join(exp_dir, "out.log"))
        logging_utils.log_versions()
        params.log(logging.getLogger())

    params["log_to_wandb"] = (world_rank == 0) and params.get("log_to_wandb", False)
    params["log_to_screen"] = (world_rank == 0) and params.get("log_to_screen", False)

    if "metadata_json_path" in params and params["metadata_json_path"]:
        params, _ = parse_dataset_metadata(params["metadata_json_path"], params=params)
    else:
        raise RuntimeError("Error, please specify a dataset descriptor file in json format")

    from makani_tpu.utils.trainer import Trainer

    if args.mode == "train":
        trainer = Trainer(params, world_rank)
        trainer.train()
    elif args.mode == "test":
        params["nettype"] = "DebugNet"
        trainer = Trainer(params, world_rank)
        trainer.test_autoregression_pipeline()


if __name__ == "__main__":
    main()
