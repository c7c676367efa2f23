#!/bin/bash
# Round-5 TPU chain, take 2 (after scripts/transfer_diag.py exonerated the
# transfer path and implicated the 268 MB init warm put — now shrunk to
# 4 MB). Serialized, with >=10-min settles between process exits.
# Usage: setsid nohup bash scripts/r5_tpu_chain2.sh > runs/r5_chain2.log 2>&1 &

set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p runs
SETTLE="${SETTLE:-600}"

stamp() { date "+%H:%M:%S"; }

echo "[$(stamp)] chain2 start"

echo "[$(stamp)] === 1/3 shipping-Trainer bench ==="
BENCH_MODE=trainer BENCH_PRINT_FREQ=20 \
  timeout 2400 python bench.py > runs/r5_trainer_bench2.log 2>&1
echo "[$(stamp)] trainer bench exit=$? ; settling ${SETTLE}s"
sleep "$SETTLE"

echo "[$(stamp)] === 2/3 convergence drive (flagship_synth_drive) ==="
timeout 3000 python -m makani_tpu.train \
  --yaml_config config/sfnonet.yaml --config flagship_synth_drive \
  --amp_mode bf16 --checkpointing_level 2 \
  > runs/r5_convergence_drive.log 2>&1
echo "[$(stamp)] convergence drive exit=$? ; settling ${SETTLE}s"
sleep "$SETTLE"

echo "[$(stamp)] === 3/3 perf batch (flagship variants + ViT sweep) ==="
timeout 3600 python scripts/r5_perf_batch.py > runs/r5_perf_batch.log 2>&1
echo "[$(stamp)] perf batch exit=$?"

echo "[$(stamp)] chain2 done"
