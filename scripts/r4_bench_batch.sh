#!/bin/bash
# Round-4 on-chip bench batch (VERDICT items 4 + 8): run each missing
# BASELINE bench serially on the single chip, appending JSON lines +
# stderr notes to the log. Launch only when the chip is free.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/r4_bench_batch.log}

run() {
  echo "### $*" >> "$LOG"
  timeout 2400 env "$@" python bench.py >> "$LOG" 2>&1
  echo "### exit $?" >> "$LOG"
}

# 1. measured HBM bandwidth (roofline denominator)
run BENCH_MODE=hbm BENCH_HBM_MB=1024 BENCH_ITERS=50

# 2. AFNO staged config (BASELINE config 2)
run BENCH_MODE=afno

# 3. rollout (serving path)
run BENCH_MODE=rollout

# 4. multistep training: n_future=1 then 3 (multistep_count 2 / 4);
#    expect OOM at the flagship width -> the embed ladder steps down and
#    BENCH_CKPT=3 is the remat rescue to try if even edim320 OOMs
run BENCH_NFUTURE=1
run BENCH_NFUTURE=3
run BENCH_NFUTURE=3 BENCH_CKPT=3

echo "batch done" >> "$LOG"
