"""Training engine tests: loss/schedule parity vs torch oracles, a tiny
end-to-end training run that must reduce the loss, checkpoint round-trip +
shape-tolerant restore, and a data-parallel step on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pitchextractor_tpu.models import JDCNet
from pitchextractor_tpu.parallel import make_mesh
from pitchextractor_tpu.train import (
    Trainer,
    bce_with_logits_loss,
    build_optimizer,
    onecycle_schedule,
    smooth_l1_loss,
)
from pitchextractor_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    tolerant_merge,
)

torch = pytest.importorskip("torch")

TINY_SEQ = {"model_type": "bilstm", "num_layers": 1, "hidden_size": 32}


def _tiny_trainer(train_batches, val_batches, mesh=None, model_dtype=None, **kwargs):
    model = JDCNet(num_class=1, sequence_model_config=TINY_SEQ, dtype=model_dtype)
    steps_per_epoch = max(len(train_batches), 1)
    tx, schedule = build_optimizer(
        {
            "params": None,
            "optimizer_params": {"lr": 1e-3},
            "scheduler_params": {"max_lr": 1e-3, "epochs": 4, "steps_per_epoch": steps_per_epoch},
        }
    )
    return Trainer(
        model=model,
        optimizer=tx,
        scheduler=schedule,
        loss_config={"lambda_f0": 0.1},
        train_dataloader=train_batches,
        val_dataloader=val_batches,
        use_mixed_precision=False,
        mesh=mesh,
        n_mels=80,
        max_mel_length=48,
        **kwargs,
    )


def _synthetic_batches(n_batches=2, B=8, T=48, M=80, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        mels = rng.standard_normal((B, 1, M, T)).astype(np.float32)
        f0 = np.abs(rng.standard_normal((B, T))).astype(np.float32) * 100
        sil = (rng.random((B, T)) > 0.7).astype(np.float32)
        f0[sil == 1] = 0.0
        batches.append((mels, f0, sil))
    return batches


# ------------------------------------------------------------------ losses
def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 32)).astype(np.float32) * 3
    b = rng.standard_normal((4, 32)).astype(np.float32) * 3
    ours = float(smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch.nn.SmoothL1Loss()(torch.from_numpy(a), torch.from_numpy(b)))
    assert abs(ours - ref) < 1e-6


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 32)).astype(np.float32) * 4
    targets = (rng.random((4, 32)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(targets))
    )
    assert abs(ours - ref) < 1e-6


# ---------------------------------------------------------------- schedule
@pytest.mark.parametrize("pct_start", [0.0, 0.3])
def test_onecycle_matches_torch(pct_start):
    epochs, steps_per_epoch, max_lr = 3, 7, 3e-4
    sched = onecycle_schedule(max_lr, epochs, steps_per_epoch, pct_start=pct_start)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    ref_sched = torch.optim.lr_scheduler.OneCycleLR(
        opt,
        max_lr=max_lr,
        epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        pct_start=pct_start,
        final_div_factor=5,
    )
    total = epochs * steps_per_epoch
    for step in range(total):
        ref_lr = opt.param_groups[0]["lr"]
        ours = float(sched(step))
        assert abs(ours - ref_lr) / max(ref_lr, 1e-12) < 1e-5, (step, ours, ref_lr)
        opt.step()
        ref_sched.step()


# ----------------------------------------------------------------- trainer
def test_training_reduces_loss():
    batches = _synthetic_batches(n_batches=2)
    trainer = _tiny_trainer(batches, batches[:1])
    first = trainer._train_epoch()
    for _ in range(2):
        last = trainer._train_epoch()
    assert last["train/loss"] < first["train/loss"]
    assert trainer.steps == 6
    ev = trainer._eval_epoch()
    assert set(ev) == {"eval/loss", "eval/f0", "eval/sil"}
    assert 0 < first["train/learning_rate"] <= 1e-3


def test_prefetch_placed_order_and_run_accepts_placed():
    """_prefetch_placed must yield every batch exactly once, in order, with
    the placed 4-tuple matching _put_batch of the paired raw batch; run()
    must accept the placed form directly."""
    batches = _synthetic_batches(n_batches=3)
    trainer = _tiny_trainer(batches, batches[:1])
    pairs = list(trainer._prefetch_placed(batches))
    assert len(pairs) == 3
    for (placed, raw), expected in zip(pairs, batches):
        assert raw is expected
        assert len(placed) == 4
        ref = trainer._put_batch(raw)
        for got, want in zip(placed, ref):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    metrics = trainer.run(pairs[0][0])
    assert np.isfinite(float(metrics["loss"]))
    # empty iterable: no yields, no hang
    assert list(trainer._prefetch_placed([])) == []


def test_training_reduces_loss_bf16_trunk():
    """Training with the bf16 conv-trunk activations (the TPU training
    default) must converge like the f32 trunk: loss decreases across epochs
    and checkpoints stay f32 (params never change dtype)."""
    batches = _synthetic_batches(n_batches=2)
    trainer = _tiny_trainer(batches, batches[:1], model_dtype=jnp.bfloat16)
    trainer.use_mixed_precision = True
    first = trainer._train_epoch()
    for _ in range(2):
        last = trainer._train_epoch()
    assert last["train/loss"] < first["train/loss"]
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype == jnp.float32


def test_train_step_metrics_finite_with_remat_and_bf16():
    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(
        batches, batches, gradient_checkpointing=True,
    )
    trainer.use_mixed_precision = True
    metrics = trainer.run(batches[0])
    assert all(np.isfinite(v) for v in metrics.values())


def test_data_parallel_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()  # (8, 1)
    batches = _synthetic_batches(n_batches=2, B=16)
    trainer = _tiny_trainer(batches, batches[:1], mesh=mesh)
    r = trainer._train_epoch()
    assert np.isfinite(r["train/loss"])
    # replicated-vs-sharded consistency: same data, single-device mesh
    mesh1 = make_mesh(devices=jax.devices()[:1])
    trainer1 = _tiny_trainer(batches, batches[:1], mesh=mesh1)
    r1 = trainer1._train_epoch()
    # XLA does not guarantee bitwise-identical f32 reductions across sharding
    # layouts (fusion/reassociation differ per mesh); 1e-3 still catches real
    # DP bugs (a wrong psum or missing shard is orders of magnitude off)
    np.testing.assert_allclose(r["train/loss"], r1["train/loss"], rtol=1e-3)


def test_eval_batch_padding_to_mesh():
    mesh = make_mesh()
    batches = _synthetic_batches(n_batches=1, B=16)
    trainer = _tiny_trainer(batches, [tuple(a[:5] for a in batches[0])], mesh=mesh)
    ev = trainer._eval_epoch()  # B=5 padded to 8-divisible
    assert np.isfinite(ev["eval/loss"])


def test_eval_padding_does_not_bias_means():
    """Padded (repeated) rows must be excluded from eval means: a ragged
    tail batch padded to the mesh multiple scores identically to the same
    rows evaluated unpadded on a single-device mesh."""
    batches = _synthetic_batches(n_batches=1, B=16)
    tail = tuple(a[:5] for a in batches[0])  # 5 rows -> 3 pad rows on mesh=8

    mesh8 = make_mesh()
    padded = _tiny_trainer(batches, [tail], mesh=mesh8)._eval_epoch()

    mesh1 = make_mesh(devices=jax.devices()[:1])
    exact = _tiny_trainer(batches, [tail], mesh=mesh1)._eval_epoch()

    for key in ("eval/loss", "eval/f0", "eval/sil"):
        np.testing.assert_allclose(padded[key], exact[key], rtol=1e-4)


# -------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    trainer.run(batches[0])
    path = str(tmp_path / "epoch_00001.ckpt")
    trainer.save_checkpoint(path)
    assert os.path.isfile(path) and os.path.isfile(path + ".json")

    trainer2 = _tiny_trainer(batches, batches)
    trainer2.load_checkpoint(path)
    assert trainer2.steps == trainer.steps
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # continued training works after restore
    m = trainer2.run(batches[0])
    assert np.isfinite(m["loss"])


def test_checkpoint_load_only_params(tmp_path):
    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    trainer.run(batches[0])
    path = str(tmp_path / "ck.ckpt")
    trainer.save_checkpoint(path)
    trainer2 = _tiny_trainer(batches, batches)
    trainer2.load_checkpoint(path, load_only_params=True)
    assert trainer2.steps == 0


def test_async_checkpoint_save_and_resume(tmp_path):
    """Async saves snapshot device state synchronously (donation-safe) and
    write on a background thread; resume after the join is bit-identical."""
    from pitchextractor_tpu.train.checkpoint import wait_for_pending_saves

    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    trainer.run(batches[0])
    path = str(tmp_path / "async.ckpt")
    trainer.save_checkpoint(path, async_save=True)
    saved_params = jax.device_get(trainer.state.params)
    trainer.run(batches[0])  # keep training while the write is in flight
    wait_for_pending_saves()
    assert os.path.isfile(path) and os.path.isfile(path + ".json")
    assert not os.path.exists(path + ".tmp")

    trainer2 = _tiny_trainer(batches, batches)
    trainer2.load_checkpoint(path)
    for x, y in zip(
        jax.tree_util.tree_leaves(saved_params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_crash_safety(tmp_path, monkeypatch):
    """A save that dies mid-write must never corrupt the previous checkpoint
    (atomic temp-file + rename; the reference's torch.save truncates in
    place)."""
    import pitchextractor_tpu.train.checkpoint as ckpt_lib

    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    path = str(tmp_path / "crash.ckpt")
    trainer.save_checkpoint(path)
    good = open(path, "rb").read()

    real_replace = os.replace

    def exploding_replace(src, dst):
        raise OSError("simulated crash during rename")

    monkeypatch.setattr(ckpt_lib.os, "replace", exploding_replace)
    trainer.run(batches[0])
    with pytest.raises(OSError, match="simulated crash"):
        trainer.save_checkpoint(path)
    monkeypatch.setattr(ckpt_lib.os, "replace", real_replace)

    # previous checkpoint bytes untouched and still loadable
    assert open(path, "rb").read() == good
    trainer2 = _tiny_trainer(batches, batches)
    trainer2.load_checkpoint(path)

    # a stale partial temp file from a hard kill is simply ignored
    with open(path + ".tmp", "wb") as fh:
        fh.write(b"partial garbage")
    trainer3 = _tiny_trainer(batches, batches)
    trainer3.load_checkpoint(path)
    m = trainer3.run(batches[0])
    assert np.isfinite(m["loss"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Optional orbax backend (SURVEY.md §5.4): directory format, shared
    tolerant-restore path."""
    pytest.importorskip("orbax.checkpoint")
    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    trainer.run(batches[0])
    path = str(tmp_path / "orbax_ckpt")
    trainer.config["training"] = {"checkpoint_backend": "orbax"}
    trainer.save_checkpoint(path)
    assert os.path.isdir(path)

    trainer2 = _tiny_trainer(batches, batches)
    trainer2.load_checkpoint(path)
    assert trainer2.steps == trainer.steps
    for x, y in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    m = trainer2.run(batches[0])
    assert np.isfinite(m["loss"])


def test_tolerant_merge_shape_mismatch():
    target = {"w": np.zeros((4, 6), np.float32), "b": np.zeros((4,), np.float32)}
    source = {"w": np.ones((2, 8), np.float32)}
    merged = tolerant_merge(target, source)
    assert merged["w"].shape == (4, 6)
    assert merged["w"][:2, :6].sum() == 12  # overlapping region copied
    assert merged["w"][2:].sum() == 0
    np.testing.assert_array_equal(merged["b"], target["b"])


def test_checkpoint_resized_head(tmp_path):
    """Reference trainer._load force_load semantics: loading a num_class=1
    checkpoint into a num_class=4 model slice-copies the overlap."""
    batches = _synthetic_batches(n_batches=1)
    trainer = _tiny_trainer(batches, batches)
    path = str(tmp_path / "ck.ckpt")
    trainer.save_checkpoint(path)

    model4 = JDCNet(num_class=4, sequence_model_config=TINY_SEQ)
    tx, schedule = build_optimizer(
        {"params": None, "optimizer_params": {}, "scheduler_params": {"max_lr": 1e-3, "epochs": 1, "steps_per_epoch": 1}}
    )
    trainer4 = Trainer(
        model=model4, optimizer=tx, scheduler=schedule,
        train_dataloader=batches, val_dataloader=batches,
        use_mixed_precision=False, n_mels=80, max_mel_length=48,
    )
    trainer4.load_checkpoint(path, load_only_params=True)
    w1 = np.asarray(trainer.state.params["classifier"]["kernel"])
    w4 = np.asarray(trainer4.state.params["classifier"]["kernel"])
    np.testing.assert_array_equal(w4[:, :1], w1)


def test_tensor_parallel_mesh_2d():
    """(data=4, model=2) mesh: TP shardings on the wide kernels, training
    step executes with finite losses close to the pure-DP result."""
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    batches = _synthetic_batches(n_batches=2, B=16)
    trainer = _tiny_trainer(batches, batches[:1], mesh=mesh)
    # at least one parameter actually sharded over the model axis
    from pitchextractor_tpu.parallel.mesh import MODEL_AXIS

    sharded = [
        s
        for s in jax.tree_util.tree_leaves(
            trainer._param_shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        if MODEL_AXIS in (s.spec or ())
    ]
    assert sharded, "expected some model-axis sharded params"
    r = trainer._train_epoch()
    assert np.isfinite(r["train/loss"])
    mesh1 = make_mesh(devices=jax.devices()[:1])
    trainer1 = _tiny_trainer(batches, batches[:1], mesh=mesh1)
    r1 = trainer1._train_epoch()
    np.testing.assert_allclose(r["train/loss"], r1["train/loss"], rtol=1e-3)


def test_trainer_helpers():
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([[0.0]])}
    assert abs(Trainer.get_gradient_norm(grads) - 5.0) < 1e-6
    mask = Trainer.length_to_mask(jnp.asarray([1, 3]))
    np.testing.assert_array_equal(
        np.asarray(mask), [[False, True, True], [False, False, False]]
    )


def test_training_determinism_same_seed():
    """Two trainers with identical seeds/batches produce identical first-step
    losses (fixed-seed regression invariant, SURVEY.md §4)."""
    batches = _synthetic_batches(n_batches=1)
    m1 = _tiny_trainer(batches, batches, seed=11).run(batches[0])
    m2 = _tiny_trainer(batches, batches, seed=11).run(batches[0])
    assert float(m1["loss"]) == float(m2["loss"])
    m3 = _tiny_trainer(batches, batches, seed=12).run(batches[0])
    assert float(m3["loss"]) != float(m1["loss"])  # seed actually matters
