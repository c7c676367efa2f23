"""Summarize a jax.profiler trace.json.gz: top device ops by total time.

Usage: python scripts/trace_top.py <trace.json.gz> [N] [category-filter]
Prints per-op device time (summed over traced steps), HLO category,
bytes/flops, and a trimmed long_name — the measurement tool for op-level
perf conclusions (wall-clock microbenches lie on this backend; see
BENCH_NOTES.md round-2 methodology).
"""

import collections
import gzip
import json
import re
import sys


def load(path):
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"]


def device_ops(events):
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"]["name"]}
    out = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            args = e.get("args", {})
            if "hlo_category" not in args:
                continue
            out.append(e)
    return out


def summarize(path, top_n=30, cat_filter=None):
    events = device_ops(load(path))
    agg = collections.defaultdict(lambda: [0.0, 0, None])
    total = 0.0
    for e in events:
        name = e["name"]
        a = agg[name]
        a[0] += e["dur"]
        a[1] += 1
        a[2] = e["args"]
        total += e["dur"]

    print(f"{path}: {len(events)} device events, total {total/1e3:.2f} ms")
    cats = collections.Counter()
    for name, (dur, n, args) in agg.items():
        cats[args.get("hlo_category", "?")] += dur
    print("\nby category:")
    for c, d in cats.most_common():
        print(f"  {d/1e3:9.2f} ms  {c}")

    print("\ntop ops:")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    shown = 0
    for name, (dur, n, args) in rows:
        cat = args.get("hlo_category", "?")
        if cat_filter and cat_filter not in cat:
            continue
        ln = args.get("long_name", "")
        ln = re.sub(r"\{[^}]*\}", "", ln)[:150]
        gb = float(args.get("bytes_accessed", 0)) / 1e9
        tf = float(args.get("model_flops", 0)) / 1e12
        print(f"{dur/1e3:9.2f} ms x{n:2d} {gb:7.2f}GB {tf:6.2f}TF [{cat}] {name}: {ln}")
        shown += 1
        if shown >= top_n:
            break


if __name__ == "__main__":
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cat = sys.argv[3] if len(sys.argv) > 3 else None
    summarize(path, top_n, cat)
