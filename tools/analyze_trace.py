#!/usr/bin/env python
"""Summarize a jax.profiler device trace (trace.json.gz) into an op-level
perf table: per-HLO-category totals and top ops with achieved GB/s / TF/s
and model-source attribution.

The round-2 legs did this ad hoc; committed here so bandwidth/FLOP ceilings
are one command away from any trace captured by tools/profile_step.py.

Usage:
  python tools/analyze_trace.py results/round3/trace_leg1 [--steps 12] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pitchextractor_tpu.utils.trace_summary import (  # noqa: E402
    V5E_BF16_TFLOPS,
    V5E_HBM_GBPS,
    find_trace,
    parse_device_ops,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "source", "tf_op"], default="op")
    args = ap.parse_args()

    with gzip.open(find_trace(args.trace)) as fh:
        trace = json.load(fh)

    rows = parse_device_ops(trace)
    cats = collections.Counter()
    for r in rows.values():
        cats[r["cat"]] += r["us"]
    total_us = sum(r["us"] for r in rows.values())

    n = args.steps
    print(f"device op time: {total_us / n / 1e3:.2f} ms/step ({len(rows)} distinct ops)\n")
    print("== by hlo_category (ms/step) ==")
    for cat, us in cats.most_common():
        print(f"{us / n / 1e3:8.2f}  {cat}")

    key = {"op": None, "source": "src", "tf_op": "tf_op"}[args.by]
    if key:
        agg = {}
        for name, r in rows.items():
            k = r[key] or "?"
            g = agg.setdefault(k, {"us": 0, "bytes": 0, "flops": 0, "cat": r["cat"]})
            for f in ("us", "bytes", "flops"):
                g[f] += r[f]
        rows = {k: dict(v, count=1, src="", tf_op="") for k, v in agg.items()}

    print(f"\n== top {args.top} by time ==")
    print(f"{'ms/step':>8} {'GB/s':>6} {'TF/s':>6} {'%HBM':>5} {'%MXU':>5}  name / attribution")
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["us"])[: args.top]:
        sec = r["us"] / 1e6
        gbps = r["bytes"] / sec / 1e9 if sec else 0
        tfs = r["flops"] / sec / 1e12 if sec else 0
        attr = r["src"] or r["tf_op"]
        label = name if args.by == "op" else name
        print(
            f"{r['us'] / n / 1e3:8.3f} {gbps:6.0f} {tfs:6.1f} "
            f"{100 * gbps / V5E_HBM_GBPS:5.0f} {100 * tfs / V5E_BF16_TFLOPS:5.0f}"
            f"  {label[:60]:60s} {attr[:60]}"
        )

    tot_bytes = sum(r["bytes"] for r in rows.values())
    tot_flops = sum(r["flops"] for r in rows.values())
    sec = total_us / 1e6
    print(
        f"\ntotals: {tot_bytes / n / 1e9:.2f} GB/step @ {tot_bytes / sec / 1e9:.0f} GB/s avg; "
        f"{tot_flops / n / 1e12:.2f} TFLOP/step @ {tot_flops / sec / 1e12:.1f} TF/s avg"
    )
    print(
        f"speed-of-light: bandwidth floor {tot_bytes / n / V5E_HBM_GBPS / 1e9 * 1e3:.1f} ms/step, "
        f"flop floor {tot_flops / n / V5E_BF16_TFLOPS / 1e12 * 1e3:.1f} ms/step"
    )


if __name__ == "__main__":
    main()
