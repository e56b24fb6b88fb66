#!/usr/bin/env python
"""A/B gradient-parity harness for mixed-precision kernel flags.

Builds the flagship training loss (JDCNet + 4-layer BiLSTM heads, B=64,
T=192, bf16 matmul precision — the same configuration bench.py measures),
computes full parameter gradients on one fixed batch with an env flag OFF
and ON (flags are read at trace time, so each variant gets a fresh trace),
and reports per-leaf cosine similarity and relative error.  This is the
gate every bf16-stream/kernel change has shipped behind (RESULTS.md legs
7-11).

Usage:
  python tools/grad_parity.py --flag PEX_LSTM_PROJ_BF16 [--time 10]
"""

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np


def build_loss(batch_size=64, T=192):
    import jax
    import jax.numpy as jnp

    from pitchextractor_tpu.models import JDCNet, activation_dtype_from
    from pitchextractor_tpu.train.losses import jdc_loss

    model = JDCNet(
        num_class=1,
        sequence_model_config={"model_type": "bilstm", "num_layers": 4, "dropout": 0.1},
        dtype=None if os.environ.get("PEX_CONV_F32") else activation_dtype_from("bf16"),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch_size, T, 80, 1)).astype(np.float32)
    )
    f0 = jnp.asarray(np.abs(rng.standard_normal((batch_size, T))).astype(np.float32) * 200)
    sil = (f0 < 100).astype(jnp.float32)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    dropout_rng = jax.random.PRNGKey(7)

    def loss_fn(p):
        with jax.default_matmul_precision("bfloat16"):
            (f0_pred, sil_pred), _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss, _, _ = jdc_loss(f0_pred, sil_pred, f0, sil, 0.1)
            return loss

    return loss_fn, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", default="PEX_LSTM_PROJ_BF16")
    ap.add_argument("--off", default="0")
    ap.add_argument("--on", default="1")
    ap.add_argument("--time", type=int, default=0, help="also time N grad calls per variant")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=192)
    args = ap.parse_args()

    from pitchextractor_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    loss_fn, params = build_loss(args.batch, args.frames)

    results = {}
    times = {}
    for label, value in (("off", args.off), ("on", args.on)):
        os.environ[args.flag] = value
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        v, g = grad_fn(params)
        print(f"{args.flag}={value}: loss={float(v):.6f}", flush=True)
        # ONE device->host fetch for the whole tree (per-leaf np.asarray is a
        # synchronous tunnel round trip each — CLAUDE.md), split host-side
        import jax.numpy as jnp

        lvs = jax.tree_util.tree_flatten_with_path(g)[0]
        names = [jax.tree_util.keystr(p) for p, _ in lvs]
        sizes = [int(np.prod(leaf.shape)) for _, leaf in lvs]
        vec = np.asarray(
            jnp.concatenate([leaf.ravel().astype(jnp.float32) for _, leaf in lvs])
        ).astype(np.float64)
        flat = {}
        ofs = 0
        for name, size in zip(names, sizes):
            flat[name] = vec[ofs : ofs + size]
            ofs += size
        results[label] = flat
        if args.time:
            # serialize via a scalar fetch per call (block_until_ready does
            # not synchronize through the axon tunnel)
            float(grad_fn(params)[0])
            t0 = time.perf_counter()
            for _ in range(args.time):
                float(grad_fn(params)[0])
            times[label] = (time.perf_counter() - t0) / args.time * 1e3

    off, on = results["off"], results["on"]
    rows = []
    for name in off:
        a, b = off[name].ravel(), on[name].ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = float(a @ b / (na * nb)) if na and nb else 1.0
        rel = float(np.linalg.norm(a - b) / na) if na else 0.0
        rows.append((cos, rel, name))
    rows.sort()
    print("\nworst-10 leaves by cosine:")
    for cos, rel, name in rows[:10]:
        print(f"  cos={cos:.6f} relerr={rel:.4f}  {name}")
    all_a = np.concatenate([off[n].ravel() for n in off])
    all_b = np.concatenate([on[n].ravel() for n in off])
    gcos = float(all_a @ all_b / (np.linalg.norm(all_a) * np.linalg.norm(all_b)))
    grel = float(np.linalg.norm(all_a - all_b) / np.linalg.norm(all_a))
    summary = {
        "flag": args.flag,
        "global_cosine": gcos,
        "global_relerr": grel,
        "min_leaf_cosine": rows[0][0],
    }
    if times:
        summary["grad_ms_off"] = round(times["off"], 2)
        summary["grad_ms_on"] = round(times["on"], 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
