#!/bin/bash
# Round-5 TPU chain, take 3: canary-gated launches. After today's cascade
# (4 dead flagship clients wedged the relay: Trainer construction went
# 23 s -> 404 s and every put RESOURCE_EXHAUSTed), each phase now waits for
# a healthy tiny-op + put-probe canary (scripts/tpu_ready.py) before
# committing a flagship process, with long sleeps between retries.
# Usage: setsid nohup bash scripts/r5_tpu_chain3.sh > runs/r5_chain3.log 2>&1 &

set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p runs
SETTLE="${SETTLE:-600}"

stamp() { date "+%H:%M:%S"; }

wait_ready() {
  # canary gate: up to 40 min of 1-GB latency+put probes; after the canary
  # process exits, give its own tiny ghosts a short settle
  echo "[$(stamp)] canary gate..."
  timeout 2600 python scripts/tpu_ready.py 1 2400
  rc=$?
  echo "[$(stamp)] canary exit=$rc; settling 180s for canary ghosts"
  sleep 180
  return $rc
}

echo "[$(stamp)] chain3 start"

wait_ready
echo "[$(stamp)] === 1/3 shipping-Trainer bench ==="
BENCH_MODE=trainer BENCH_PRINT_FREQ=20 \
  timeout 2400 python bench.py > runs/r5_trainer_bench3.log 2>&1
echo "[$(stamp)] trainer bench exit=$? ; settling ${SETTLE}s"
sleep "$SETTLE"

wait_ready
echo "[$(stamp)] === 2/3 convergence drive (flagship_synth_drive) ==="
timeout 3000 python -m makani_tpu.train \
  --yaml_config config/sfnonet.yaml --config flagship_synth_drive \
  --amp_mode bf16 --checkpointing_level 2 \
  > runs/r5_convergence_drive.log 2>&1
echo "[$(stamp)] convergence drive exit=$? ; settling ${SETTLE}s"
sleep "$SETTLE"

wait_ready
echo "[$(stamp)] === 3/3 perf batch (flagship variants + ViT sweep) ==="
timeout 3600 python scripts/r5_perf_batch.py > runs/r5_perf_batch.log 2>&1
echo "[$(stamp)] perf batch exit=$?"

echo "[$(stamp)] chain3 done"
