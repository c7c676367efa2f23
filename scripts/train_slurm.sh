#!/bin/bash
#SBATCH --job-name=makani_tpu
#SBATCH --ntasks-per-node=1
# Multi-node SLURM launch (parity with ref: test.sh / v250508/template.sh).
#
# One task per node/host; jax.distributed.initialize() reads the SLURM envs
# (SLURM_NTASKS > 1 triggers the rendezvous in makani_tpu.parallel.comm).
# For clusters without resolvable coordinator discovery, export
# JAX_COORDINATOR_ADDRESS=<host0>:<port> on every task.
set -euo pipefail

CONFIG="${1:-sfno_linear_73chq_sc3_layers8_edim384_wstgl2}"
YAML="${YAML:-config/sfnonet.yaml}"

srun --kill-on-bad-exit=1 python -m makani_tpu.train \
    --yaml_config "$YAML" \
    --config "$CONFIG" \
    --amp_mode bf16 \
    --h_parallel_size "${H_PAR:-1}" \
    --w_parallel_size "${W_PAR:-1}" \
    --fin_parallel_size "${FIN_PAR:-1}" \
    --fout_parallel_size "${FOUT_PAR:-1}" \
    "${@:2}"
