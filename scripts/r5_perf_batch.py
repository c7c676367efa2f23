"""Round-5 on-chip perf batch: ALL single-chip measurements in ONE process.

The axon relay frees an exited client's chip allocations lazily (minutes),
so every extra TPU process costs a ~10-min settle window (BENCH_NOTES
round-5).  This script therefore batches the whole round-5 measurement
matrix into a single process:

  1. flagship edim384 default            (round-5 reference point)
  2. flagship edim384 + fused Pallas Adam (BENCH_FUSED=1)
  3. flagship edim384 + fused + bf16 norm statistics (BENCH_NORM=bf16)
  4. ViT attention key-block sweep 512 / 1024 / 2048 (BENCH_BLOCK)

Each variant builds a FRESH model + step function (fresh function objects →
fresh jit traces; module-global knobs like set_norm_stats_mode are re-read
at trace time), so the stale-trace caveat in CLAUDE.md does not bite.
Variants run inside try/except: one failure doesn't forfeit the rest of the
batch (a process crash would wedge the chip for ~10 min).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/r5_perf_batch.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _reset_env(keys):
    for k in keys:
        os.environ.pop(k, None)


def run_variant(tag, env, fn, *args):
    print(f"\n### variant: {tag} {env}", file=sys.stderr, flush=True)
    print(f"### variant: {tag}", flush=True)
    os.environ.update(env)
    t0 = time.perf_counter()
    try:
        fn(*args)
        print(f"### {tag} done in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
    except Exception:
        print(f"### {tag} FAILED after {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        traceback.print_exc()
    finally:
        _reset_env(list(env) + ["_BENCH_PREC_TAG"])


def main():
    os.environ.setdefault("BENCH_ITERS", "20")

    which = os.environ.get("R5_BATCH", "flagship,vit").split(",")

    if "flagship" in which:
        run_variant("flagship-default", {}, bench.run_train_bench, 384)
        run_variant("flagship-fused", {"BENCH_FUSED": "1"},
                    bench.run_train_bench, 384)
        run_variant("flagship-fused-bf16norm",
                    {"BENCH_FUSED": "1", "BENCH_NORM": "bf16"},
                    bench.run_train_bench, 384)
        # undo the module-global norm mode for any later variants
        from makani_tpu.models.common.layers import set_norm_stats_mode
        set_norm_stats_mode("f32")

    if "vit" in which:
        os.environ["BENCH_ITERS"] = "8"
        for blk in (512, 1024, 2048):
            run_variant(f"vit-block{blk}", {"BENCH_BLOCK": str(blk)},
                        bench.bench_vit)

    print("### batch complete", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
