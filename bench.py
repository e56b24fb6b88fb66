#!/usr/bin/env python
"""Benchmark: training throughput (primary) + F0 labeling throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Runs on whatever JAX platform the environment provides (the real TPU chip
under the driver).  The primary metric is end-to-end training-step throughput
on the flagship config (JDCNet + 4-layer BiLSTM head, batch 64, 192 frames,
bf16 matmuls) in utterances/sec/chip.  Details (labeler throughput, step
times) go to ``bench_details.json``.

``vs_baseline`` compares against ``bench_baseline.json`` (committed after the
first on-hardware measurement; the reference publishes no numbers —
BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _bench_train_step(
    batch_size=64, T=192, steps=50, warmup=5, windows=9, seq_cfg=None
):
    """Median-of-windows training throughput with fresh host batches.

    Hardened per round-1 review: >=50 timed steps per window, median of
    ``windows`` back-to-back windows (the remote tunnel has ~±20% run-to-run
    variance), and every step consumes a *different* host batch from a
    rotating pool so the measurement pays the per-step host->device
    transfer the real training loop pays.  Round 3 lengthened the default
    budget to 9 windows (~30 s of timed stepping at the flagship step time)
    so the hour-scale tunnel drift averages out — the per-window rates are
    recorded in bench_details.json so drift stays visible.
    """
    import jax

    from pitchextractor_tpu.models import JDCNet
    from pitchextractor_tpu.parallel import make_mesh
    from pitchextractor_tpu.train import Trainer, build_optimizer

    # bf16 conv-trunk activations (model_params.activation_dtype) are the
    # training default; PEX_CONV_F32=1 opts back into the f32 trunk for A/B
    from pitchextractor_tpu.models import activation_dtype_from

    model = JDCNet(
        num_class=1,
        sequence_model_config=seq_cfg
        or {"model_type": "bilstm", "num_layers": 4, "dropout": 0.1},
        dtype=None
        if os.environ.get("PEX_CONV_F32")
        else activation_dtype_from("bf16"),
        # Lane-native packed trunk (models/freq_pack.py): ON by default since
        # the round-4 leg-F A/B (+7.1% utt/s, -6.1% device step time,
        # results/round4/bench_legF_freqpack.json); exact + checkpoint-
        # identical (9 parity gates).  PEX_NO_FREQ_PACK=1 opts out for A/B.
        freq_pack=not os.environ.get("PEX_NO_FREQ_PACK"),
    )
    tx, schedule = build_optimizer(
        {
            "params": None,
            "optimizer_params": {"lr": 3e-4},
            "scheduler_params": {"max_lr": 3e-4, "epochs": 100, "steps_per_epoch": 100},
        }
    )
    mesh = make_mesh(model_parallel=1)
    trainer = Trainer(
        model=model,
        optimizer=tx,
        scheduler=schedule,
        loss_config={"lambda_f0": 0.1},
        use_mixed_precision=True,
        mesh=mesh,
        n_mels=80,
        max_mel_length=T,
    )
    rng = np.random.default_rng(0)
    pool = []
    for _ in range(16):
        mels = rng.standard_normal((batch_size, 1, 80, T)).astype(np.float32)
        f0 = np.abs(rng.standard_normal((batch_size, T))).astype(np.float32) * 200
        sil = (f0 < 100).astype(np.float32)
        pool.append((mels, f0, sil))

    # NOTE: jax.block_until_ready does not synchronize through remote
    # transports (axon); force a device->host scalar fetch instead.
    for i in range(warmup):
        metrics = trainer.run(pool[i % len(pool)])
    float(metrics["loss"])

    # batches flow through the same transfer-prefetch path the training
    # epoch loop uses: every step still pays for a fresh host batch, but the
    # copy of batch i+1 rides along step i's compute (trainer._prefetch_placed)
    window_rates = []
    step_idx = 0
    for _ in range(windows):
        fresh = (pool[(step_idx + k) % len(pool)] for k in range(steps))
        step_idx += steps
        t0 = time.perf_counter()
        for placed, _ in trainer._prefetch_placed(fresh):
            metrics = trainer.run(placed)
        float(metrics["loss"])  # sync on the full dependency chain
        window_rates.append(batch_size * steps / (time.perf_counter() - t0))

    n_chips = len(jax.devices())
    utt_per_sec = float(np.median(window_rates))

    # Utilization cross-check (VERDICT r3 weak #6): trace a few steps and
    # attach achieved GB/s + TF/s.  A tunnel-drifted wall-clock number then
    # stands out post hoc — device-side utilization stays put under drift.
    trace_stats = {}
    try:
        import shutil
        import tempfile

        from pitchextractor_tpu.utils.profiler import trace as profiler_trace
        from pitchextractor_tpu.utils.trace_summary import summarize_trace

        trace_dir = tempfile.mkdtemp(prefix="pex_bench_trace_")
        trace_steps = 6
        try:
            with profiler_trace(trace_dir):
                fresh = (pool[k % len(pool)] for k in range(trace_steps))
                for placed, _ in trainer._prefetch_placed(fresh):
                    metrics = trainer.run(placed)
                float(metrics["loss"])
            trace_stats = summarize_trace(trace_dir, trace_steps)
        finally:
            shutil.rmtree(trace_dir, ignore_errors=True)
    except Exception as exc:  # never let the cross-check sink the bench
        trace_stats = {"trace_error": repr(exc)}

    return {
        **trace_stats,
        "train_utt_per_sec": utt_per_sec,
        "train_utt_per_sec_per_chip": utt_per_sec / n_chips,
        "train_step_ms": 1000.0 * batch_size / utt_per_sec,
        "train_window_utt_per_sec": [round(r, 1) for r in window_rates],
        "n_chips": n_chips,
        "batch_size": batch_size,
        "frames": T,
        "timed_steps": steps * windows,
    }


def _bench_labeler(batch_size=64, seconds=2.4, steps=10, warmup=2):
    import jax
    import jax.numpy as jnp

    from pitchextractor_tpu.labels.trackers import TrackerParams, track_pitch_batch

    sr, hop = 24000, 300
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    freqs = rng.uniform(100, 400, size=(batch_size, 1))
    audio = np.sin(2 * np.pi * freqs * t[None, :]).astype(np.float32)
    audio += 0.01 * rng.standard_normal(audio.shape).astype(np.float32)
    batch = jnp.asarray(audio)
    params = TrackerParams()

    # force a device->host fetch to synchronize (block_until_ready is a
    # no-op through remote transports)
    def run_once():
        out = track_pitch_batch(batch, sr, hop, params)
        return float(out[0, 0])

    run_once()
    for _ in range(warmup):
        run_once()
    t0 = time.perf_counter()
    for _ in range(steps):
        run_once()
    elapsed = time.perf_counter() - t0
    total_audio_seconds = batch_size * seconds * steps
    return {
        "label_utts_per_sec": batch_size * steps / elapsed,
        "label_audio_seconds_per_sec": total_audio_seconds / elapsed,
    }


def main():
    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    details = {}
    try:
        details.update(_bench_train_step())
    except Exception as exc:  # keep the contract: always print one line
        details["train_error"] = repr(exc)
    if os.environ.get("PEX_BENCH_TRANSFORMER"):
        try:
            tf = _bench_train_step(
                seq_cfg={
                    "model_type": "transformer",
                    "num_layers": 4,
                    "dropout": 0.1,
                    "nhead": 8,
                    "dim_feedforward": 1536,
                },
            )
            details["transformer_train_utt_per_sec_per_chip"] = tf[
                "train_utt_per_sec_per_chip"
            ]
            details["transformer_train_step_ms"] = tf["train_step_ms"]
        except Exception as exc:
            details["transformer_error"] = repr(exc)
    try:
        details.update(_bench_labeler())
    except Exception as exc:
        details["label_error"] = repr(exc)

    value = details.get("train_utt_per_sec_per_chip", 0.0)
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.isfile(baseline_path):
        try:
            baseline = json.load(open(baseline_path)).get("train_utt_per_sec_per_chip")
            if baseline:
                vs_baseline = value / float(baseline)
        except (OSError, json.JSONDecodeError, ValueError):
            pass

    with open("bench_details.json", "w") as fh:
        json.dump(details, fh, indent=2, sort_keys=True)

    line = {
        "metric": "train_utterances_per_sec_per_chip",
        "value": round(float(value), 3),
        "unit": "utt/s/chip (B=64, T=192, bf16)",
        "vs_baseline": round(float(vs_baseline), 4),
    }
    # self-auditing fields (VERDICT r3 #9): device-side utilization from a
    # short trace, so a drifted wall-clock window is identifiable post hoc
    if details.get("device_ms_per_step"):
        for k in ("hbm_gbps", "tfs", "device_ms_per_step"):
            line[k] = details[k]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
