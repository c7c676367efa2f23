#!/bin/bash
# Round-5 serialized TPU drive chain. ONE process on the chip at a time,
# with the >=10-min relay settle between process exits (BENCH_NOTES
# round-5: the relay frees a dead client's allocations lazily; flagship
# jobs launched earlier OOM on ghost memory).
#
# Order = failure-risk order: the shipping-Trainer drives go first while
# the relay is freshest (this chain is normally launched on a clean boot).
#
#   1. BENCH_MODE=trainer bench.py       (verdict r4 #1: shipping Trainer,
#      native loader, AR validation, ckpt save/restore, steps/s vs twin)
#   2. train CLI convergence drive       (verdict r4 #8: >=500 on-chip steps
#      at the canonical flagship shape, decreasing loss + rollout metrics)
#   3. scripts/r5_perf_batch.py          (verdict r4 #3/#7: fused-Adam and
#      bf16-norm A/B at edim384 + ViT attention block sweep)
#
# Usage: setsid nohup bash scripts/r5_tpu_chain.sh > runs/r5_chain.log 2>&1 &

set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p runs
SETTLE="${SETTLE:-600}"

stamp() { date "+%H:%M:%S"; }

echo "[$(stamp)] chain start"

echo "[$(stamp)] === 1/3 shipping-Trainer bench ==="
BENCH_MODE=trainer BENCH_PRINT_FREQ=20 \
  timeout 2400 python bench.py > runs/r5_trainer_bench.log 2>&1
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

echo "[$(stamp)] chain done"
