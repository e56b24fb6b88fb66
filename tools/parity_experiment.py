#!/usr/bin/env python
"""Trained-model accuracy parity: PyTorch reference vs this framework.

BASELINE.md's driver-set target is "RPA and voicing-F1 within 0.5% of the
PyTorch reference".  Round 1 proved *forward* parity on converted weights;
this experiment proves *trained* parity: both stacks train on the identical
corpus, identical cached F0 labels (analytic ground truth written in the
dataset's cache format), and the *identical realized batch stream* (dumped
to disk once and replayed into both trainers), then both are evaluated with
identical chunked inference + metrics on held-out files.

The reference's own data layer cannot run in this image (torchaudio and
soundfile are not installed), so its model/trainer/optimizer stack
(/root/reference/model.py, trainer.py:219-252, optimizers.py:50-76 — pure
torch, importable) consumes batches produced by this framework's pipeline.
That is exactly the comparison that matters: same inputs, two training
stacks, compare trained-model accuracy.

Stages (run in order; each is resumable / independently re-runnable):
  python tools/parity_experiment.py gen        --root results/round2/parity_data
  python tools/parity_experiment.py train-torch --root ... --out results/round2/torch_run
  python tools/parity_experiment.py train-jax   --root ... --out results/round2/jax_run
  python tools/parity_experiment.py evaluate    --root ... --torch-run ... --jax-run ...
                                                --csv results/round2/parity.csv
"""

import argparse
import glob
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

SR = 24000
HOP = 300
N_MELS = 80
T_FRAMES = 192
BATCH = 16
EPOCHS = 50
N_TRAIN = 160
N_VAL = 32
LR = 3e-4  # reference Configs/config.yml:28
# identical model config on both sides; 2 BiLSTM layers keep the torch-CPU
# run tractable in this 1-core image (4-layer default: ~14 s/step)
SEQ_CFG = {"model_type": "bilstm", "num_layers": 2, "dropout": 0.1}
# Phase 3 ("converged parity"): phases 1-2 pass the delta gate but end with
# both models near absolute RPA 0 — the pitch head is still far from
# converged after 1000 full-size CPU steps, so the gate compares two
# early-training models.  Phase 3 is an independent run under the same
# replayed-batch protocol, sized so BOTH stacks reach meaningful absolute
# RPA on this 1-core host: narrower F0 range, a hidden-128 single-layer
# head, no dropout, and a higher OneCycle peak.
SEQ_CFG3 = {"model_type": "bilstm", "hidden_size": 128, "num_layers": 1, "dropout": 0.0}
BATCH3 = 8  # with T3=96: ~4x cheaper torch-CPU steps than the phase-1/2 shape
T_FRAMES3 = 96  # both JDCNets are T-agnostic (ref model.py:93 derives seq_len)
EPOCHS3 = 66  # x12 steps/epoch = 792 steps
N_TRAIN3 = 96
N_VAL3 = 32
LR3 = 1e-3
F0_RANGE3 = (110.0, 320.0)
# Phase 4: phase 3 ends with both stacks at ~45 Hz voiced MAE (locked
# step-for-step, but RPA(50c) near 0 on both sides).  Extension: warm-start
# from the phase-3 result and replay the SAME batches3 stream REPLAYS4 more
# passes under a fresh half-peak OneCycle — still a bitwise-identical batch
# stream for both stacks, enough optimizer steps for the pitch head to reach
# gate-meaningful absolute RPA.
REPLAYS4 = 2  # 1584 steps: torch-CPU costs 3.5-12 s/step on this 1-core host
LR4 = LR3 / 2
MEL_PARAMS = {
    "sample_rate": SR,
    "n_fft": 1024,
    "win_length": 1024,
    "hop_length": HOP,
    "n_mels": N_MELS,
}


def _force_cpu_jax():
    os.environ.setdefault("XLA_FLAGS", "")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------- corpus
def _synth_utterance(rng: np.random.Generator, duration_s: float, f0_range=(110.0, 450.0)):
    """Harmonic utterance with silence head/tail and exact analytic F0.

    Returns (waveform float32, full-file frame contour float32 at HOP)."""
    n = int(SR * duration_s)
    t = np.arange(n) / SR

    lead = rng.uniform(0.10, 0.35)
    trail = rng.uniform(0.10, 0.35)
    voiced = (t >= lead) & (t <= duration_s - trail)

    # piecewise log-linear F0 with optional vibrato
    n_nodes = int(rng.integers(2, 5))
    node_t = np.sort(rng.uniform(0, duration_s, n_nodes))
    node_t[0], node_t[-1] = 0.0, duration_s
    node_f = np.exp(rng.uniform(np.log(f0_range[0]), np.log(f0_range[1]), n_nodes))
    f0 = np.interp(t, node_t, node_f)
    if rng.random() < 0.5:
        rate = rng.uniform(4.0, 7.0)
        depth = rng.uniform(20.0, 80.0)
        f0 = f0 * 2.0 ** ((depth / 1200.0) * np.sin(2 * np.pi * rate * t))

    phase = 2 * np.pi * np.cumsum(f0) / SR
    n_partials = int(rng.integers(3, 8))
    rolloff = rng.uniform(0.35, 0.75)
    x = np.zeros(n)
    for k in range(1, n_partials + 1):
        if k * f0.max() < SR / 2:
            x += (rolloff ** (k - 1)) * np.sin(k * phase)
    x *= voiced.astype(np.float64)
    peak = np.abs(x).max()
    if peak > 0:
        x *= rng.uniform(0.3, 0.6) / peak
    x += rng.uniform(1e-4, 3e-3) * rng.standard_normal(n)

    n_frames = int(np.ceil(n / HOP)) + 2
    frame_t = np.minimum(np.arange(n_frames) * HOP, n - 1) / SR
    contour = np.interp(frame_t, t, f0)
    frame_voiced = (frame_t >= lead) & (frame_t <= duration_s - trail)
    contour = np.where(frame_voiced, contour, 0.0)
    return x.astype(np.float32), contour.astype(np.float32)


def stage_gen(root: str, seed: int = 7, phase: int = 1) -> None:
    """Phase 1: synthesize the corpus + dump the epoch 0-49 batch stream.

    Phase 2 (extension; the 500-step phase-1 runs end with both models still
    at RPA~0 — too undertrained for an accuracy comparison): dump epochs
    50-99 from the same corpus with a reseeded crop stream.  Both trainers
    then replay these identical batches as a phase-2 fine-tune segment.

    Phase 3 (converged parity): an independent small-model run — fresh
    narrow-band corpus (train3_*/val3_*, F0_RANGE3), its own batch stream
    (batches3/) and meta3.json carrying SEQ_CFG3/LR3 — sized so both stacks
    reach meaningful absolute RPA, which phases 1-2 never do."""
    _force_cpu_jax()
    from pitchextractor_tpu.data import build_dataloader
    from pitchextractor_tpu.io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed if phase < 3 else seed + 3000)
    lists = {"train": [], "val": []}
    prefix3 = "" if phase < 3 else "3"
    if phase == 1 or phase == 3:
        counts = (N_TRAIN, N_VAL) if phase == 1 else (N_TRAIN3, N_VAL3)
        f0_range = (110.0, 450.0) if phase == 1 else F0_RANGE3
        dur = (2.4, 3.2) if phase == 1 else (2.0, 2.6)
        for split, count in zip(("train", "val"), counts):
            for i in range(count):
                path = os.path.join(root, f"{split}{prefix3}_{i:03d}.wav")
                wav, contour = _synth_utterance(rng, rng.uniform(*dur), f0_range)
                write_wav(path, wav, SR)
                # legacy-format cache: loaded verbatim by both pipelines, so
                # the "labels" are analytic truth and identical by construction
                np.save(path + "_f0.npy", contour)
                lists[split].append(path)
        for split in lists:
            with open(os.path.join(root, f"{split}{prefix3}_list.txt"), "w") as fh:
                fh.writelines(p + "|x\n" for p in lists[split])
    else:
        lists["train"] = [
            line.split("|")[0]
            for line in open(os.path.join(root, "train_list.txt")).read().splitlines()
            if line
        ]

    # dump the realized batch stream once; both trainers replay it
    dataset_config = {
        "mel_params": MEL_PARAMS,
        "f0_params": {},
        "verbose": False,
        "seed": {1: seed, 2: seed + 1000, 3: seed + 2000}[phase],
    }
    batch = BATCH if phase < 3 else BATCH3
    loader = build_dataloader(
        [p + "|x" for p in lists["train"]],
        validation=False,
        batch_size=batch,
        num_workers=1,
        dataset_config=dataset_config,
    )
    batch_dir = os.path.join(root, "batches" + prefix3)
    os.makedirs(batch_dir, exist_ok=True)
    t0 = time.time()
    n_steps = 0
    epoch_range = {
        1: range(EPOCHS),
        2: range(EPOCHS, 2 * EPOCHS),
        3: range(EPOCHS3),
    }[phase]
    for epoch in epoch_range:
        for step, (mels, f0s, sils) in enumerate(loader):
            if phase == 3:  # cheaper replayed steps: truncate segments to T3
                mels, f0s, sils = mels[..., :T_FRAMES3], f0s[:, :T_FRAMES3], sils[:, :T_FRAMES3]
            np.savez(
                os.path.join(batch_dir, f"ep{epoch:03d}_s{step:02d}.npz"),
                mels=mels.astype(np.float32),
                f0=f0s.astype(np.float32),
                sil=sils.astype(np.float32),
            )
            n_steps += 1
        if epoch == 0 and phase == 1:
            val_loader = build_dataloader(
                [p + "|x" for p in lists["val"]],
                validation=True,
                batch_size=BATCH,
                num_workers=1,
                dataset_config=dict(dataset_config),
            )
            for step, (mels, f0s, sils) in enumerate(val_loader):
                np.savez(
                    os.path.join(batch_dir, f"val_s{step:02d}.npz"),
                    mels=mels.astype(np.float32),
                    f0=f0s.astype(np.float32),
                    sil=sils.astype(np.float32),
                )
    if phase == 1:
        meta = {
            "epochs": EPOCHS,
            "batch": BATCH,
            "steps": n_steps,
            "steps_per_epoch": n_steps // EPOCHS,
            "seq_cfg": SEQ_CFG,
            "lr": LR,
            "seed": seed,
        }
    elif phase == 2:
        meta = json.load(open(os.path.join(root, "meta.json")))
        meta["steps2"] = n_steps
        meta["lr2"] = LR / 2  # phase-2 fine-tune OneCycle peak
    else:
        meta = {
            "epochs": EPOCHS3,
            "batch": BATCH3,
            "steps": n_steps,
            "steps_per_epoch": n_steps // EPOCHS3,
            "seq_cfg": SEQ_CFG3,
            "lr": LR3,
            "seed": seed + 3000,
        }
    meta_name = "meta.json" if phase < 3 else "meta3.json"
    with open(os.path.join(root, meta_name), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(f"gen phase {phase} done: {n_steps} steps dumped in {time.time() - t0:.0f}s")


def _batch_files(root: str, phase: int = 1):
    if phase in (3, 4):
        meta = json.load(open(os.path.join(root, "meta3.json")))
        files = sorted(glob.glob(os.path.join(root, "batches3", "ep*.npz")))
        assert len(files) == meta["steps"], (len(files), meta["steps"])
        if phase == 4:
            files = files * REPLAYS4
            meta = {**meta, "epochs": meta["epochs"] * REPLAYS4}
        return meta, files
    meta = json.load(open(os.path.join(root, "meta.json")))
    files = sorted(glob.glob(os.path.join(root, "batches", "ep*.npz")))
    phase1 = [f for f in files if int(os.path.basename(f)[2:5]) < meta["epochs"]]
    phase2 = [f for f in files if int(os.path.basename(f)[2:5]) >= meta["epochs"]]
    if phase == 1:
        assert len(phase1) == meta["steps"], (len(phase1), meta["steps"])
        return meta, phase1
    assert len(phase2) == meta.get("steps2"), (len(phase2), meta.get("steps2"))
    return meta, phase2


# ---------------------------------------------------------------- torch side
def stage_train_torch(root: str, out: str, phase: int = 1) -> None:
    sys.path.insert(0, "/root/reference")
    import torch

    import model as ref_model  # /root/reference/model.py
    import optimizers as ref_optimizers
    import trainer as ref_trainer

    torch.manual_seed(0)
    meta, files = _batch_files(root, phase)
    os.makedirs(out, exist_ok=True)
    suffix = {1: "", 2: "2", 3: "3", 4: "4"}[phase]
    lr = meta["lr2"] if phase == 2 else (LR4 if phase == 4 else meta["lr"])

    net = ref_model.JDCNet(num_class=1, sequence_model_config=meta["seq_cfg"])
    if phase in (2, 4):
        # warm start from the previous phase's result; fresh OneCycle segment
        warm = "model.pth" if phase == 2 else "model3.pth"
        net.load_state_dict(
            torch.load(os.path.join(out, warm), map_location="cpu")
        )
    optimizer, scheduler = ref_optimizers.build_optimizer(
        {
            "params": net.parameters(),
            "optimizer_params": {"lr": lr},
            "scheduler_params": {
                "max_lr": lr,
                "epochs": meta["epochs"],
                "steps_per_epoch": meta["steps_per_epoch"],
            },
        }
    )
    trainer = ref_trainer.Trainer(
        model=net,
        criterion={"l1": torch.nn.SmoothL1Loss(), "ce": torch.nn.BCEWithLogitsLoss()},
        optimizer=optimizer,
        scheduler=scheduler,
        loss_config={"lambda_f0": 0.1},
        device=torch.device("cpu"),
        use_mixed_precision=False,
    )

    # resumable: full state saved every 25 steps so the run survives kills
    resume_path = os.path.join(out, f"resume{suffix}.pth")
    start = 0
    if os.path.isfile(resume_path):
        snap = torch.load(resume_path, map_location="cpu")
        net.load_state_dict(snap["model"])
        optimizer.load_state_dict(snap["optimizer"])
        scheduler.load_state_dict(snap["scheduler"])
        start = int(snap["step"])
        print(f"resuming from step {start}", flush=True)

    log_path = os.path.join(out, f"train_log{suffix}.jsonl")
    t0 = time.time()
    with open(log_path, "a") as log:
        for i in range(start, len(files)):
            data = np.load(files[i])
            batch = [
                torch.from_numpy(data["mels"]),
                torch.from_numpy(data["f0"]),
                torch.from_numpy(data["sil"]),
            ]
            net.train()
            losses = trainer.run(batch)
            if (i + 1) % 10 == 0:
                rec = {"step": i + 1, "elapsed_s": round(time.time() - t0, 1), **losses}
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(rec, flush=True)
            if (i + 1) % 25 == 0 or i + 1 == len(files):
                torch.save(
                    {
                        "model": net.state_dict(),
                        "optimizer": optimizer.state_dict(),
                        "scheduler": scheduler.state_dict(),
                        "step": i + 1,
                    },
                    resume_path,
                )
    torch.save(net.state_dict(), os.path.join(out, f"model{suffix}.pth"))
    print(f"train-torch phase {phase} done: {len(files)} steps in {time.time() - t0:.0f}s")


# ------------------------------------------------------------------ jax side
def stage_train_jax(root: str, out: str, platform: str = "cpu", phase: int = 1) -> None:
    if platform == "cpu":
        _force_cpu_jax()
    from pitchextractor_tpu.models import JDCNet
    from pitchextractor_tpu.parallel import make_mesh
    from pitchextractor_tpu.train import Trainer, build_optimizer

    meta, files = _batch_files(root, phase)
    os.makedirs(out, exist_ok=True)
    suffix = {1: "", 2: "2", 3: "3", 4: "4"}[phase]
    lr = meta["lr2"] if phase == 2 else (LR4 if phase == 4 else meta["lr"])

    model = JDCNet(num_class=1, sequence_model_config=meta["seq_cfg"])
    tx, schedule = build_optimizer(
        {
            "params": None,
            "optimizer_params": {"lr": lr},
            "scheduler_params": {
                "max_lr": lr,
                "epochs": meta["epochs"],
                "steps_per_epoch": meta["steps_per_epoch"],
            },
        }
    )
    trainer = Trainer(
        model=model,
        optimizer=tx,
        scheduler=schedule,
        loss_config={"lambda_f0": 0.1},
        use_mixed_precision=False,  # match the torch-CPU run (fp32)
        mesh=make_mesh(model_parallel=1),
        n_mels=N_MELS,
        max_mel_length=T_FRAMES if phase < 3 else T_FRAMES3,
    )
    # resumable like the torch stage: full state (params+opt+steps) saved
    # every 50 steps so the run survives kills/timeouts
    resume_path = os.path.join(out, f"resume{suffix}.ckpt")
    start = 0
    if os.path.isfile(resume_path):
        trainer.load_checkpoint(resume_path, load_only_params=False)
        start = int(trainer.steps)
        print(f"resuming from step {start}", flush=True)
    elif phase in (2, 4):
        # warm start from the previous phase's result; fresh OneCycle segment
        warm = "model.ckpt" if phase == 2 else "model3.ckpt"
        trainer.load_checkpoint(os.path.join(out, warm), load_only_params=True)

    log_path = os.path.join(out, f"train_log{suffix}.jsonl")
    t0 = time.time()
    with open(log_path, "a") as log:
        for i in range(start, len(files)):
            data = np.load(files[i])
            metrics = trainer.run((data["mels"], data["f0"], data["sil"]))
            if (i + 1) % 10 == 0:
                rec = {
                    "step": i + 1,
                    "elapsed_s": round(time.time() - t0, 1),
                    **{k: float(v) for k, v in metrics.items()},
                }
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(rec, flush=True)
            if (i + 1) % 50 == 0:
                trainer.save_checkpoint(resume_path)
    trainer.save_checkpoint(os.path.join(out, f"model{suffix}.ckpt"))
    print(f"train-jax phase {phase} done: {len(files)} steps in {time.time() - t0:.0f}s")


# --------------------------------------------------------------------- eval
def _torch_predict_f0(
    net, audio: np.ndarray, melspec, chunk_size: int = T_FRAMES, overlap: int = 48
) -> np.ndarray:
    """Chunked inference for the torch model, frame-identical to
    F0Predictor's stitching (center-split overlaps: chunk i>0 contributes
    frames [overlap/2, stride + overlap/2) — must stay in lock-step with
    infer/predict.py so the parity eval compares models, not stitchers)."""
    import torch

    mel = melspec(audio)  # (M, T); __call__ takes a 1-D waveform
    mel = (np.log(1e-5 + mel) + 4.0) / 4.0
    total = 1 + len(audio) // HOP
    step = chunk_size - overlap
    half = overlap // 2
    out = np.zeros((total,), dtype=np.float32)
    net.eval()
    starts = list(range(0, total, step))
    with torch.no_grad():
        for i, start in enumerate(starts):
            chunk = mel[:, start : start + chunk_size]
            if chunk.shape[1] < chunk_size:
                chunk = np.pad(chunk, ((0, 0), (0, chunk_size - chunk.shape[1])))
            x = torch.from_numpy(chunk.astype(np.float32))[None, None]  # (1,1,M,T)
            f0_pred, _ = net(x.transpose(-1, -2))
            pred = f0_pred.squeeze(0).squeeze(-1).numpy()
            lo = 0 if i == 0 else half
            hi = chunk_size if i == len(starts) - 1 else step + half
            end = min(start + hi, total)
            if start + lo >= end:
                continue
            out[start + lo : end] = pred[lo : end - start]
    return out


def _voicing_f1(truth_voiced: np.ndarray, pred_voiced: np.ndarray) -> float:
    tp = float(np.sum(truth_voiced & pred_voiced))
    fp = float(np.sum(~truth_voiced & pred_voiced))
    fn = float(np.sum(truth_voiced & ~pred_voiced))
    return 2 * tp / max(2 * tp + fp + fn, 1e-9)


def stage_evaluate(
    root: str, torch_run: str, jax_run: str, csv_path: str, phase: int = 1
) -> None:
    _force_cpu_jax()
    sys.path.insert(0, "/root/reference")
    import torch

    import model as ref_model

    from pitchextractor_tpu.dsp.mel import MelSpectrogram
    from pitchextractor_tpu.eval.metrics import compute_metrics
    from pitchextractor_tpu.infer import F0Predictor, load_model
    from pitchextractor_tpu.io import read_audio

    meta_name = "meta.json" if phase < 3 else "meta3.json"
    meta = json.load(open(os.path.join(root, meta_name)))
    suffix = {1: "", 2: "2", 3: "3", 4: "4"}[phase]

    net = ref_model.JDCNet(num_class=1, sequence_model_config=meta["seq_cfg"])
    net.load_state_dict(
        torch.load(os.path.join(torch_run, f"model{suffix}.pth"), map_location="cpu")
    )
    melspec = MelSpectrogram(
        sample_rate=SR,
        n_fft=MEL_PARAMS["n_fft"],
        win_length=MEL_PARAMS["win_length"],
        hop_length=HOP,
        n_mels=N_MELS,
    )

    # phase 3 trains on T=96 segments; evaluate with matching 96-frame
    # chunks on both sides (both models are T-agnostic, but inference should
    # match the trained context length)
    chunk_size = T_FRAMES if phase < 3 else T_FRAMES3
    model, variables = load_model(
        os.path.join(jax_run, f"model{suffix}.ckpt"),
        # older checkpoints in this experiment predate self-describing
        # sidecars; pin the architecture to the one actually trained
        config={"model_params": {"num_class": 1, "sequence_model": meta["seq_cfg"]}},
    )
    predictor = F0Predictor(
        model, variables, mel_params=MEL_PARAMS, chunk_size=chunk_size
    )

    val_paths = [
        line.split("|")[0]
        for line in open(os.path.join(root, "val_list.txt" if phase < 3 else "val3_list.txt")).read().splitlines()
        if line
    ]
    per_model = {"torch": [], "jax": []}
    for path in val_paths:
        audio, sr = read_audio(path)
        audio = np.asarray(audio, dtype=np.float32)
        truth = np.load(path + "_f0.npy")
        preds = {
            "torch": _torch_predict_f0(net, audio, melspec, chunk_size=chunk_size),
            "jax": predictor.predict_f0(audio),
        }
        for name, pred in preds.items():
            n = min(len(truth), len(pred))
            m = compute_metrics(truth[:n], pred[:n])
            m["VoicingF1"] = _voicing_f1(truth[:n] > 0, pred[:n] > 10.0)
            per_model[name].append(m)

    rows = []
    summary = {}
    for name, ms in per_model.items():
        row = {"model": name, "files": len(ms)}
        for key in ("RPA", "RCA", "VUV", "OctaveError", "VoicingF1"):
            vals = [m[key] for m in ms if not np.isnan(m[key])]
            row[key] = round(float(np.mean(vals)), 4) if vals else float("nan")
        rows.append(row)
        summary[name] = row
    delta = {
        "model": "delta(jax-torch)",
        "files": len(val_paths),
        **{
            k: round(summary["jax"][k] - summary["torch"][k], 4)
            for k in ("RPA", "RCA", "VUV", "OctaveError", "VoicingF1")
        },
    }
    rows.append(delta)

    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    import csv

    with open(csv_path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    for row in rows:
        print(row)
    ok = abs(delta["RPA"]) <= 0.005 and abs(delta["VoicingF1"]) <= 0.005
    print(f"parity gate (|dRPA|<=0.005 and |dVoicingF1|<=0.005): {'PASS' if ok else 'FAIL'}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="stage", required=True)
    for name in ("gen", "train-torch", "train-jax", "evaluate"):
        p = sub.add_parser(name)
        p.add_argument("--root", required=True)
        p.add_argument("--phase", type=int, default=1, choices=(1, 2, 3, 4))
        if name == "train-torch":
            p.add_argument("--out", required=True)
        if name == "train-jax":
            p.add_argument("--out", required=True)
            p.add_argument("--platform", default="cpu")
        if name == "evaluate":
            p.add_argument("--torch-run", required=True)
            p.add_argument("--jax-run", required=True)
            p.add_argument("--csv", required=True)
    args = parser.parse_args()
    if args.stage == "gen":
        stage_gen(args.root, phase=args.phase)
    elif args.stage == "train-torch":
        stage_train_torch(args.root, args.out, phase=args.phase)
    elif args.stage == "train-jax":
        stage_train_jax(args.root, args.out, args.platform, phase=args.phase)
    elif args.stage == "evaluate":
        stage_evaluate(args.root, args.torch_run, args.jax_run, args.csv, phase=args.phase)


if __name__ == "__main__":
    main()
