"""Checkpoint-to-checkpoint suite comparison.

The reference workflow for judging a new checkpoint is manual: re-run a
notebook, eyeball the pandas tables against a previous run's CSV artifacts
(e.g. Utils/dynamic_pitch_behavior.ipynb cells 9-11 write
``notebooks/artifacts/*.csv`` with cleared outputs).  This module makes that
diff a first-class operation over the scripted suites' artifacts
(``eval/suites.py::run_all`` writes ``{suite}_metrics.csv`` per suite):

    python evaluate.py --compare run_a_dir run_b_dir

Rows are matched on their sweep-parameter columns (everything that is not a
metric), so the comparison stays valid when two runs cover the same grid in
a different order; unmatched rows are reported, not silently dropped.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Optional, Tuple

# Metric columns produced by eval.metrics.compute_metrics/compute_metrics_batch
# and the suite runners; everything else in a row is a sweep parameter.
METRIC_KEYS = (
    "RPA",
    "RCA",
    "VUV",
    "OctaveError",
    "RMSE_cents",
    "Lag_ms",
    "Overshoot_cents",
    "VoicingF1",
)


def _parse(value: str):
    if value is None or value == "":
        return None
    try:
        return float(value)
    except ValueError:
        return value


def load_metrics_csv(path: str) -> List[Dict]:
    with open(path, newline="", encoding="utf-8") as fh:
        return [{k: _parse(v) for k, v in row.items()} for row in csv.DictReader(fh)]


def _row_key(row: Dict) -> Tuple:
    return tuple(sorted((k, row[k]) for k in row if k not in METRIC_KEYS))


def compare_rows(rows_a: List[Dict], rows_b: List[Dict]) -> Dict:
    """Diff two suite-CSV row lists (delta = b - a per metric column)."""
    index_a = {_row_key(r): r for r in rows_a}
    index_b = {_row_key(r): r for r in rows_b}
    matched = [k for k in index_a if k in index_b]

    delta_rows: List[Dict] = []
    sums: Dict[str, List[float]] = {}
    for key in matched:
        a, b = index_a[key], index_b[key]
        out = {k: v for k, v in dict(key).items()}
        for metric in METRIC_KEYS:
            va, vb = a.get(metric), b.get(metric)
            if isinstance(va, float) and isinstance(vb, float):
                d = vb - va
                out[f"d_{metric}"] = d
                if d == d:  # skip NaNs in the aggregate
                    sums.setdefault(metric, []).append(d)
        delta_rows.append(out)

    return {
        "rows": delta_rows,
        "matched": len(matched),
        "only_a": len(rows_a) - len(matched),
        "only_b": len(rows_b) - len(matched),
        "mean_delta": {m: sum(v) / len(v) for m, v in sums.items() if v},
    }


def compare_dirs(dir_a: str, dir_b: str, output_dir: Optional[str] = None) -> Dict[str, Dict]:
    """Compare every ``{suite}_metrics.csv`` present in both directories.

    Returns {suite: comparison dict}; when ``output_dir`` is given, writes a
    ``{suite}_compare.csv`` of per-row deltas for each suite.
    """
    suites_a = {
        os.path.basename(p)[: -len("_metrics.csv")]: p
        for p in glob.glob(os.path.join(dir_a, "*_metrics.csv"))
    }
    suites_b = {
        os.path.basename(p)[: -len("_metrics.csv")]: p
        for p in glob.glob(os.path.join(dir_b, "*_metrics.csv"))
    }
    results: Dict[str, Dict] = {}
    for name in sorted(set(suites_a) & set(suites_b)):
        comparison = compare_rows(load_metrics_csv(suites_a[name]), load_metrics_csv(suites_b[name]))
        results[name] = comparison
        if output_dir and comparison["rows"]:
            os.makedirs(output_dir, exist_ok=True)
            rows = comparison["rows"]
            keys: List[str] = []
            for row in rows:
                for k in row:
                    if k not in keys:
                        keys.append(k)
            with open(
                os.path.join(output_dir, f"{name}_compare.csv"), "w", newline="", encoding="utf-8"
            ) as fh:
                writer = csv.DictWriter(fh, fieldnames=keys)
                writer.writeheader()
                writer.writerows(rows)
    return results


def summarize(results: Dict[str, Dict]) -> Dict[str, Dict]:
    """Compact JSON-friendly summary: per-suite mean metric deltas."""
    return {
        name: {
            "matched_rows": comp["matched"],
            "unmatched_rows": comp["only_a"] + comp["only_b"],
            **{f"mean_d_{m}": round(v, 6) for m, v in sorted(comp["mean_delta"].items())},
        }
        for name, comp in results.items()
    }
