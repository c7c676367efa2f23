#!/bin/bash
# Multi-host training launch on a Cloud TPU pod slice (TPU-VM).
#
# Capability parity with the reference's torchrun/SLURM launchers
# (ref: test.sh, v250508/template.sh, README.md:29-67) mapped to the TPU
# world: one python process per TPU-VM host; jax.distributed.initialize()
# auto-discovers the pod topology (no MASTER_ADDR/torchrun rendezvous).
#
# Run the SAME command on every host of the slice, e.g.:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd makani_tpu_repo && bash scripts/train_pod_tpuvm.sh sfno_linear_73chq_sc3_layers8_edim384_wstgl2"
set -euo pipefail

CONFIG="${1:-sfno_linear_73chq_sc3_layers8_edim384_wstgl2}"
YAML="${YAML:-config/sfnonet.yaml}"

# h/w spatial decomposition rides ICI within a host group; the data axis
# absorbs the remaining devices (spanning DCN across hosts).
H_PAR="${H_PAR:-1}"
W_PAR="${W_PAR:-1}"
FIN_PAR="${FIN_PAR:-1}"
FOUT_PAR="${FOUT_PAR:-1}"

# force the multi-process rendezvous path even where auto-detection
# (Cloud TPU metadata / SLURM envs) is unavailable
export MAKANI_DISTRIBUTED=1

exec python -m makani_tpu.train \
    --yaml_config "$YAML" \
    --config "$CONFIG" \
    --amp_mode bf16 \
    --h_parallel_size "$H_PAR" \
    --w_parallel_size "$W_PAR" \
    --fin_parallel_size "$FIN_PAR" \
    --fout_parallel_size "$FOUT_PAR" \
    "${@:2}"
