"""trace_summary: machine-readable GB/s / TF/s from a profiler trace.

The reference has no profiling (SURVEY.md §5.1); these tests pin the parsing
contract bench.py relies on for its self-auditing ``hbm_gbps``/``tfs`` fields.
"""

import gzip
import json
import os

from pitchextractor_tpu.utils.trace_summary import (
    find_trace,
    parse_device_ops,
    summarize_trace,
)


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as fh:
        json.dump({"traceEvents": events}, fh)


def _fake_trace(tmp_path):
    # one TPU device lane (pid 1), one host lane (pid 2)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1, "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2, "args": {"name": "python"}},
        # two steps of the same op: 1 ms each, 1 MB + 1 GFLOP each
        *[
            {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 1000,
             "args": {"device_duration_ps": 1, "bytes_accessed": 1_000_000,
                      "model_flops": 1_000_000_000, "hlo_category": "loop fusion"}}
            for _ in range(2)
        ],
        # jit wrapper + host event must be ignored
        {"ph": "X", "pid": 1, "name": "jit_train_step", "dur": 99999, "args": {}},
        {"ph": "X", "pid": 2, "name": "hostwork", "dur": 99999,
         "args": {"bytes_accessed": 1}},
    ]
    p = os.path.join(str(tmp_path), "t", "host.trace.json.gz")
    _write_trace(p, events)
    return p


def test_parse_filters_to_device_stat_events(tmp_path):
    p = _fake_trace(tmp_path)
    with gzip.open(p) as fh:
        rows = parse_device_ops(json.load(fh))
    assert set(rows) == {"fusion.1"}
    assert rows["fusion.1"]["count"] == 2
    assert rows["fusion.1"]["bytes"] == 2_000_000


def test_summarize_per_step_and_rates(tmp_path):
    p = _fake_trace(tmp_path)
    s = summarize_trace(p, steps=2)
    assert s["device_ms_per_step"] == 1.0
    # 1 MB / 1 ms = 1 GB/s; 1 GFLOP / 1 ms = 1 TF/s
    assert s["hbm_gbps"] == 1.0
    assert s["tfs"] == 1.0
    assert s["categories_ms_per_step"] == {"loop fusion": 1.0}


def test_find_trace_picks_file_under_dir(tmp_path):
    p = _fake_trace(tmp_path)
    assert find_trace(str(tmp_path)) == p
    assert find_trace(p) == p
