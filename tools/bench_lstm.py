#!/usr/bin/env python
"""Microbenchmark for the LSTM recurrence variants on the real chip.

Isolates the sequence-head recurrence (the training-step bottleneck,
RESULTS.md "Step-time split") from the conv stack so kernel work can be
measured directly.  Each variant runs N dependent iterations inside ONE
jitted fori_loop (single dispatch, on-device serialization via a scalar
data dependency), so the wall time is honest device time — important
because ``block_until_ready`` does not synchronize through the axon
tunnel (CLAUDE.md).

Flagship shapes: T=192, B=64, H=384; the full model runs 4 layers x 2
heads = 8 bidirectional layer applications per step (C=2 fusion: 8 kernel
calls; C=4 cross-head fusion: 4 calls).

Usage: python tools/bench_lstm.py [--iters 20] [--variants v1,v2,...]
"""

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

T, B, H = 192, 64, 384
H4 = 4 * H


def _inputs(C: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.standard_normal((T, C, B, H4)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, H, H4)) * 0.05, jnp.float32)
    return xp, w


def _scan_chain(x_proj, w_hh):
    """lax.scan reference recurrence for one chain (models/sequence.py)."""

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = lax.scan(step, init, x_proj)
    return hs


def timed_loop(f, args, iters, calls_per_iter=1):
    """Run ``f(*args)`` ``iters`` times on-device with a serializing scalar
    dependency; returns (ms per f-call, ms per recurrence-step)."""

    @jax.jit
    def loop(args):
        def body(_, carry):
            s, args = carry
            perturbed = jax.tree.map(lambda a: a + s.astype(a.dtype), args)
            out = f(*perturbed)
            s = s + 1e-30 * jnp.sum(out).astype(jnp.float32)
            return (s, args)

        s, _ = lax.fori_loop(0, iters, body, (jnp.float32(0.0), args))
        return s

    # compile + warm up
    t0 = time.time()
    r = loop(args)
    _ = float(np.asarray(r))  # forced transfer = real sync through the tunnel
    compile_s = time.time() - t0

    t0 = time.time()
    r = loop(args)
    _ = float(np.asarray(r))
    total = time.time() - t0
    per_call_ms = total * 1e3 / (iters * calls_per_iter)
    return per_call_ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import pitchextractor_tpu.ops.lstm_pallas as m

    want = set(v for v in args.variants.split(",") if v)

    def run(name, f, fargs, calls_per_iter=1, steps_per_model_step=1536):
        if want and name not in want:
            return
        per_call_ms, compile_s = timed_loop(f, fargs, args.iters, calls_per_iter)
        per_step_us = per_call_ms * 1e3 / T
        model_ms = per_call_ms * steps_per_model_step / T
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms_per_call": round(per_call_ms, 3),
                    "us_per_seq_step": round(per_step_us, 2),
                    "model_recurrence_ms": round(model_ms, 2),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )

    xp2, w2 = _inputs(2)
    xp4, w4 = _inputs(4)

    # ---- forward variants ----
    # NOTE: _bilstm_recurrence without grad is the inference path
    # (save_carry=False: no cell-state history written); fwd_train_* time the
    # with-carry forward the VJP uses (combined [h|c] output stream).
    run("fwd_scan_c2", lambda xp, w: _scan_chain(xp[:, 0], w[0]) + _scan_chain(xp[:, 1], w[1]), (xp2, w2))
    run("fwd_pallas_c2", lambda xp, w: m._bilstm_recurrence(xp, w)[:, 0], (xp2, w2))
    run("fwd_pallas_c4", lambda xp, w: m._bilstm_recurrence(xp, w)[:, 0], (xp4, w4), steps_per_model_step=768)
    run(
        "fwd_train_c4",
        lambda xp, w: m._multichain_kernel_call(xp, w, save_carry=True)[0],
        (xp4, w4),
        steps_per_model_step=768,
    )

    # ---- forward+backward variants ----
    def loss_pallas(xp, w):
        return jnp.sum(m._bilstm_recurrence(xp, w) ** 2)

    def loss_scan(xp, w):
        return jnp.sum(_scan_chain(xp[:, 0], w[0]) ** 2) + jnp.sum(
            _scan_chain(xp[:, 1], w[1]) ** 2
        )

    grad_scan = jax.grad(loss_scan)
    grad_pallas = jax.grad(loss_pallas)
    run("fb_scan_c2", lambda xp, w: grad_scan(xp, w)[0], (xp2, w2))
    run("fb_pallas_c2", lambda xp, w: grad_pallas(xp, w)[0], (xp2, w2))
    run("fb_pallas_c4", lambda xp, w: grad_pallas(xp, w)[0], (xp4, w4), steps_per_model_step=768)

    # same, but with the Pallas BPTT backward kernel forced on
    if not want or any("bptt" in v for v in want):
        m_use = m._use_pallas_bptt
        m._use_pallas_bptt = lambda: True
        try:
            grad_bptt = jax.grad(loss_pallas)
            run("fb_bptt_c2", lambda xp, w: grad_bptt(xp, w)[0], (xp2, w2))
            run("fb_bptt_c4", lambda xp, w: grad_bptt(xp, w)[0], (xp4, w4), steps_per_model_step=768)
        finally:
            m._use_pallas_bptt = m_use

    # bf16 gate matmuls inside the kernels (f32 accumulate)
    if not want or any("bf16" in v for v in want):
        m_use, m_bf = m._use_pallas_bptt, m._use_bf16_matmuls
        m._use_pallas_bptt = lambda: True
        m._use_bf16_matmuls = lambda: True
        try:
            grad_bf16 = jax.jit(jax.grad(loss_pallas))
            run("fwd_bf16_c4", lambda xp, w: m._bilstm_recurrence(xp, w)[:, 0], (xp4, w4), steps_per_model_step=768)
            run("fb_bf16_c4", lambda xp, w: grad_bf16(xp, w)[0], (xp4, w4), steps_per_model_step=768)
        finally:
            m._use_pallas_bptt, m._use_bf16_matmuls = m_use, m_bf


if __name__ == "__main__":
    main()
