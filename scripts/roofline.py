"""Honest speed-of-light accounting for the flagship train step (VERDICT r3
item 8): model the minimum HBM bytes a step must move, combine with the
MEASURED achievable bandwidth (BENCH_MODE=hbm) and the measured steps/s, and
print the roofline table for BENCH_NOTES.

The step is substantially HBM-bound (round-3 traces: conv fusions at the
per-op HBM roofline), so the binding roofline is bytes/step / BW, not
flops/peak. The bytes model is explicit and conservative-LOW (perfect fusion,
each tensor moved exactly as often as the dataflow requires) — the real step
can only move more, so "% of roofline" is a lower bound on how close we are.

Usage:
  python scripts/roofline.py --hbm-gbs <measured> --steps-per-s <measured> \
      [--embed 384]
"""

import argparse


def model_bytes(embed=384, layers=8, chans=73, nlat=721, nlon=1440,
                scale=3, moment_bytes=2):
    """Per-component minimum HBM bytes for one train step (batch 1)."""
    h, w = nlat // scale, nlon // scale       # inner grid 240 x 480
    lmax, mmax = h, w // 2 + 1                # 240, 241

    B = {}

    # ---- optimizer / parameter state (exact, from the param tree census:
    # 572.5M params; dhconv filters 8 x (384,384,240,2) dominate) ----------
    P = 572.5e6
    p32 = P * 4
    B["params fwd read"] = p32               # weights read in forward
    B["params bwd read"] = p32               # read again for weight grads/VJP
    B["grads write+read"] = 2 * p32          # produced by bwd, consumed by opt
    B["moments read+write"] = 2 * 2 * P * moment_bytes  # m and v, r+w each
    B["params write"] = p32                  # update

    # ---- activations (modeled; bf16 = 2 bytes) ---------------------------
    full = embed * nlat * nlon * 2           # (384,721,1440) bf16 = 797 MB
    inner = embed * h * w * 2                # (384,240,480) bf16 = 88 MB
    coeff = embed * lmax * mmax * 8          # complex64 coeffs = 178 MB
    io = chans * nlat * nlon * 2             # 73ch bf16 input/pred = 151 MB

    # head/tail at full resolution, fwd+bwd (checkpointing=2 recomputes the
    # encoder/decoder interiors once): encoder 1x1-conv chain, big-skip
    # residual, trans_down input read, itrans_up output write, decoder chain.
    # Census: ~6 full-res embed tensors each moved ~3x (write + read fwd,
    # reread in bwd/remat).
    B["full-res head/tail acts"] = 6 * 3 * full
    B["input/target/pred io"] = 6 * io

    # per layer at the inner grid: filter in/out, coeffs in/out of the
    # Legendre/dhconv dots, norm/skip/MLP (ratio 2 -> 2x inner hidden),
    # fwd + bwd each. ~12 inner tensors + 4 coeff tensors moved twice.
    B["inner-grid block acts"] = layers * 2 * (12 * inner + 4 * coeff)

    # SHT tables: legendre (mmax, lmax, nlat_inner) f32 read fwd+bwd per
    # full-res + inner transform pair
    tables = (mmax * lmax * h + (nlon // 2 + 1) * lmax * nlat) * 4
    B["transform tables"] = 4 * tables

    return B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hbm-gbs", type=float, required=True,
                    help="measured BENCH_MODE=hbm bandwidth, GB/s")
    ap.add_argument("--steps-per-s", type=float, action="append", default=[],
                    help="measured steps/s (repeatable: mixed, default, ...)")
    ap.add_argument("--labels", type=str, default="mixed,default")
    ap.add_argument("--embed", type=int, default=384)
    ap.add_argument("--flops", type=float, default=17.77e12)
    args = ap.parse_args()

    B = model_bytes(embed=args.embed)
    total = sum(B.values())
    print(f"modeled minimum HBM bytes/step (embed {args.embed}):")
    for k, v in B.items():
        print(f"  {k:28s} {v/1e9:7.2f} GB")
    print(f"  {'TOTAL':28s} {total/1e9:7.2f} GB")
    t_min = total / (args.hbm_gbs * 1e9)
    print(f"\nmeasured HBM bandwidth: {args.hbm_gbs:.1f} GB/s")
    print(f"implied minimum step time: {t_min*1e3:.1f} ms  "
          f"(= {1/t_min:.2f} steps/s speed-of-light)")
    labels = args.labels.split(",")
    for label, sps in zip(labels, args.steps_per_s):
        pct = sps * t_min * 100
        print(f"  {label:8s}: {sps:.3f} steps/s -> {pct:.0f}% of HBM roofline "
              f"({sps*args.flops/1e12:.1f} TF/s sustained)")


if __name__ == "__main__":
    main()
