"""Inference CLI (parity with ref: makani/inference.py:35-349).

Modes:
  score : single-IC rollout; dump denormalized predictions + targets as NetCDF
  epoch : full-dataset scoring (ACC/RMSE curves + fork RMSE npy exports)
  lite  : rollout without targets (optional SST persistence / IC perturbation)
"""

import argparse
import logging
import os

import numpy as np

from makani_tpu.parallel import comm
from makani_tpu.utils import logging_utils
from makani_tpu.utils.yparams import YParams
from makani_tpu.utils.dataset_metadata import parse_dataset_metadata
from makani_tpu.utils.nctools import write_prediction_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fin_parallel_size", default=1, type=int)
    parser.add_argument("--fout_parallel_size", default=1, type=int)
    parser.add_argument("--h_parallel_size", default=1, type=int)
    parser.add_argument("--w_parallel_size", default=1, type=int)
    parser.add_argument("--run_num", default="00", type=str)
    parser.add_argument("--yaml_config", default="./config/sfnonet.yaml", type=str)
    parser.add_argument("--config", default="base_73chq", type=str)
    parser.add_argument("--batch_size", default=-1, type=int)
    parser.add_argument("--amp_mode", default="none", type=str, choices=["none", "fp16", "bf16"])
    parser.add_argument("--checkpointing_level", default=0, type=int)
    parser.add_argument("--mode", default="score", type=str, choices=["score", "lite", "epoch"])
    parser.add_argument("--checkpoint_path", default=None, type=str)
    parser.add_argument("--save_checkpoint", default="flexible", type=str)
    parser.add_argument("--load_checkpoint", default="flexible", type=str)
    parser.add_argument("--inference_ic", default=0, type=int)
    parser.add_argument("--inference_output_path", default="./predictions.nc", type=str)
    parser.add_argument("--inference_target_path", default="./targets.nc", type=str)
    parser.add_argument("--overwrite_output_path", action="store_true")
    parser.add_argument("--enable_synthetic_data", action="store_true")
    parser.add_argument("--samples_offset", default=0, type=int,
                        help="inference IC offset into the dataset (fork feature, "
                             "ref: makani/inference.py:68, dali_es_helper_2d.py:303-307)")
    parser.add_argument("--enable_odirect", action="store_true")
    parser.add_argument("--enable_benchy", action="store_true")
    parser.add_argument("--epsilon_factor", default=0, type=float)
    parser.add_argument("--split_data_channels", action="store_true")
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
    params["samples_offset"] = args.samples_offset
    params["enable_odirect"] = args.enable_odirect
    params["enable_benchy"] = args.enable_benchy
    params["epsilon_factor"] = args.epsilon_factor
    params["split_data_channels"] = args.split_data_channels

    world_rank = comm.init(model_parallel_sizes=params["model_parallel_sizes"],
                           model_parallel_names=params["model_parallel_names"])

    params["world_size"] = comm.get_world_size()
    if args.batch_size > 0:
        params.batch_size = args.batch_size
    params["global_batch_size"] = params.batch_size
    params["batch_size"] = int(params["global_batch_size"] // comm.get_size("data"))

    exp_dir = os.path.join(params.exp_dir, args.config, str(args.run_num))
    if world_rank == 0 and not os.path.isdir(exp_dir):
        os.makedirs(exp_dir, exist_ok=True)
        os.makedirs(os.path.join(exp_dir, "deterministic_scores"), exist_ok=True)
    params["experiment_dir"] = os.path.abspath(exp_dir)

    if args.checkpoint_path is None:
        params["checkpoint_path"] = os.path.join(exp_dir, "training_checkpoints", "best_ckpt")
    else:
        params["checkpoint_path"] = args.checkpoint_path

    params["resuming"] = False
    params["amp_mode"] = args.amp_mode
    params["checkpointing"] = args.checkpointing_level
    params["enable_synthetic_data"] = args.enable_synthetic_data
    params["n_future"] = 0

    if world_rank == 0:
        logging_utils.config_logger()
        logging_utils.log_to_file(logger_name=None, log_filename=os.path.join(exp_dir, "inference_out.log"))
        logging_utils.log_versions()
        params.log(logging.getLogger())

    params["log_to_wandb"] = False
    params["log_to_screen"] = (world_rank == 0) and params.get("log_to_screen", False)

    if "metadata_json_path" in params and params["metadata_json_path"]:
        params, _ = parse_dataset_metadata(params["metadata_json_path"], params=params)
    else:
        raise RuntimeError("Error, please specify a dataset descriptor file in json format")

    from makani_tpu.utils.inferencer import Inferencer

    if args.mode == "score":
        for path in [params.global_means_path, params.global_stds_path]:
            if not os.path.exists(path):
                raise FileNotFoundError(path)
        global_means = np.load(params.global_means_path)
        global_stds = np.load(params.global_stds_path)

        output_path = args.inference_output_path
        target_path = args.inference_target_path
        if not args.overwrite_output_path and os.path.exists(output_path):
            raise FileExistsError(output_path)

        output_channels = list(range(len(params["out_channels"])))
        inferencer = Inferencer(params, world_rank)
        targets, predictions = inferencer.inference_single(
            ic=args.inference_ic, output_data=True, output_channels=output_channels)

        predictions = np.asarray(predictions).squeeze(axis=1)
        targets = np.asarray(targets).squeeze(axis=1)

        oc = params["out_channels"]
        predictions = predictions * global_stds[:, oc] + global_means[:, oc]
        targets = targets * global_stds[:, oc] + global_means[:, oc]

        for p, d in [(output_path, predictions), (target_path, targets)]:
            if args.overwrite_output_path and os.path.exists(p):
                os.remove(p)
            write_prediction_file(p, d)
        logging.info(f"predictions saved to {output_path}")

    elif args.mode == "epoch":
        inferencer = Inferencer(params, world_rank)
        inferencer.score_model(output_channels=params["out_channels"])

    elif args.mode == "lite":
        global_means = np.load(params.global_means_path)
        global_stds = np.load(params.global_stds_path)
        output_path = args.inference_output_path
        if not args.overwrite_output_path and os.path.exists(output_path):
            raise FileExistsError(output_path)

        output_channels = list(range(len(params["out_channels"])))
        inferencer = Inferencer(params, world_rank)
        (predictions,) = inferencer.inference_lite(
            ic=args.inference_ic, output_data=True, output_channels=output_channels)
        predictions = np.asarray(predictions).squeeze(axis=1)
        oc = params["out_channels"]
        predictions = predictions * global_stds[:, oc] + global_means[:, oc]
        if args.overwrite_output_path and os.path.exists(output_path):
            os.remove(output_path)
        write_prediction_file(output_path, predictions)
        logging.info(f"predictions saved to {output_path}")


if __name__ == "__main__":
    main()
