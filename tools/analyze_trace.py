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
import glob
import gzip
import json
import os
import re

V5E_HBM_GBPS = 819.0  # v5e HBM peak
V5E_BF16_TFLOPS = 197.0  # v5e MXU bf16 peak


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "source", "tf_op"], default="op")
    args = ap.parse_args()

    with gzip.open(find_trace(args.trace)) as fh:
        trace = json.load(fh)

    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not dev_pids:
        dev_pids = set(pids)

    rows = {}
    cats = collections.Counter()
    total_us = 0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        a = e.get("args") or {}
        dur = e.get("dur", 0)
        if not a and "." not in name and not name.startswith(("fusion", "copy")):
            continue  # scope markers (named_scope annotations)
        if "device_duration_ps" not in a and "bytes_accessed" not in a:
            continue
        total_us += dur
        cat = a.get("hlo_category", "?")
        cats[cat] += dur
        r = rows.setdefault(
            name,
            {"us": 0, "count": 0, "bytes": 0, "flops": 0,
             "cat": cat,
             "src": a.get("source", ""), "tf_op": a.get("tf_op", "")},
        )
        r["us"] += dur
        r["count"] += 1
        r["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        r["flops"] += int(a.get("model_flops", 0) or 0)

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
