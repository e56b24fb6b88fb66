"""Training engine: jit-compiled data-parallel train/eval steps over a device
mesh.

TPU-first redesign of the reference ``Trainer`` (trainer.py:32-291):

- **One compiled program per step.** The whole forward+loss+backward+AdamW
  update is a single ``jax.jit`` with donated state; the reference's
  per-batch Python (zero_grad / H2D copies / scaler juggling / scheduler
  step) all becomes part of the compiled graph.  The LR schedule is a pure
  function of the step counter inside the graph — per-step OneCycle exactly
  like ``scheduler.step()`` per batch (trainer.py:248).
- **Mixed precision the TPU way.** The reference needs CUDA AMP + GradScaler
  (trainer.py:63-102).  On TPU, master params stay f32 and matmuls/convs run
  on the MXU in bf16 via ``jax.default_matmul_precision`` — no loss scaling
  required (bf16 has f32's exponent range).
- **Gradient checkpointing** maps to ``jax.checkpoint`` over the model apply
  (reference trainer.py:103-136 wraps the whole model in
  ``torch.utils.checkpoint``), trading recompute for HBM.
- **Data parallelism** (absent in the reference, SURVEY.md §2.11): batches
  are sharded over the mesh's ``data`` axis, parameters replicated; XLA
  inserts the gradient all-reduce over ICI.  BatchNorm statistics reduce over
  the *global* (logical) batch by construction.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..dsp.mel import MEL_LOG_OFFSET, MEL_MEAN, MEL_STD, mel_spectrogram_gemm
from ..parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from ..parallel.sharding import infer_param_shardings, place_params
from . import checkpoint as ckpt_lib
from .losses import jdc_loss, jdc_loss_masked

logger = logging.getLogger(__name__)


class TrainState:
    """Mutable holder for the jitted step's donated state pytree."""

    def __init__(self, params, batch_stats, opt_state, steps: int = 0):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.steps = jnp.asarray(steps, jnp.int32)

    def as_tuple(self):
        return (self.params, self.batch_stats, self.opt_state, self.steps)

    @classmethod
    def from_tuple(cls, tup):
        state = cls(tup[0], tup[1], tup[2], 0)
        state.steps = tup[3]
        return state


class Trainer:
    """Drop-in role of the reference Trainer (trainer.py:32-48 signature)."""

    def __init__(
        self,
        model=None,
        optimizer=None,  # optax GradientTransformation
        scheduler=None,  # schedule fn(step) -> lr (for logging)
        config: Optional[Dict] = None,
        loss_config: Optional[Dict] = None,
        train_dataloader=None,
        val_dataloader=None,
        logger_=None,
        initial_steps: int = 0,
        initial_epochs: int = 0,
        use_mixed_precision: bool = True,
        gradient_checkpointing: bool = False,
        mesh=None,
        seed: int = 0,
        n_mels: int = 80,
        max_mel_length: int = 192,
        mel_params: Optional[Dict] = None,
    ) -> None:
        self.model = model
        self.tx = optimizer
        self.schedule = scheduler
        self.config = config or {}
        self.loss_config = loss_config or {}
        self.train_dataloader = train_dataloader
        self.val_dataloader = val_dataloader
        self.logger = logger_ or logger
        self.epochs = int(initial_epochs)
        self.use_mixed_precision = bool(use_mixed_precision)
        self.gradient_checkpointing = bool(gradient_checkpointing)
        self.n_mels = int(n_mels)
        self.max_mel_length = int(max_mel_length)
        # used by the on-device front-end path (2-D waveform batches): the
        # GEMM mel + log-norm run inside the jitted step on the MXU
        from ..config import normalize_mel_params

        self.mel_params = normalize_mel_params(mel_params)
        self.finish_train = False

        self.mesh = mesh if mesh is not None else make_mesh(model_parallel=1)
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self._replicated = NamedSharding(self.mesh, P())
        self._rng = jax.random.PRNGKey(seed)
        # Dropout mask stream: ``unsafe_rbg`` generates bits via the XLA
        # RngBitGenerator instead of in-graph threefry ALU work — measured
        # +3-4% step throughput on the flagship (results/round2/rng_ab.jsonl).
        # Mask quality is irrelevant to the guarantees unsafe_rbg relaxes
        # (derived-key independence); model/param init stays threefry.
        # ``training.dropout_prng: threefry`` opts back in (bit-exact vs the
        # pre-knob training path).
        dropout_impl = str(
            ((config or {}).get("training") or {}).get("dropout_prng", "unsafe_rbg")
        )
        self._dropout_rng = (
            self._rng
            if dropout_impl == "threefry"
            else jax.random.key(seed, impl=dropout_impl)
        )
        self._model_parallel = int(self.mesh.shape[MODEL_AXIS])
        if self._model_parallel > 1:
            # the Pallas recurrence kernel cannot be partitioned by the XLA
            # sharding pass — fall back to the lax.scan path under TP
            os.environ["PEX_DISABLE_PALLAS_LSTM"] = "1"
        else:
            # pure data parallelism: the kernels shard themselves over the
            # mesh's data axis via shard_map (each device runs its batch
            # shard — the recurrence is independent per batch row)
            from ..ops.lstm_pallas import set_sharding_mesh

            set_sharding_mesh(self.mesh)
        if not self.use_mixed_precision:
            # fp32 mode means fp32 everywhere: opt the Pallas kernels out of
            # their default bf16 gate matmuls (parity/oracle runs)
            os.environ.setdefault("PEX_LSTM_BF16", "0")

        # --- initialise model + optimizer state --------------------------
        dummy = jnp.zeros((2, self.max_mel_length, self.n_mels, 1), jnp.float32)
        variables = self.model.init(self._rng, dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # rule-based tensor-parallel shardings over the model axis (no-op
        # replication on a 1-wide axis); optimizer moments inherit placement
        # from the placed params through tx.init's zeros_like
        self._param_shardings = infer_param_shardings(params, self.mesh)
        params = place_params(params, self._param_shardings)
        put = partial(jax.device_put, device=self._replicated)
        batch_stats = jax.tree_util.tree_map(put, batch_stats)
        # moments inherit the params' sharding via zeros_like; scalar leaves
        # (step counts) need explicit replication on multi-device meshes
        opt_state = jax.tree_util.tree_map(
            lambda x: put(x) if getattr(x, "ndim", 1) == 0 else x,
            self.tx.init(params),
        )
        self.state = TrainState(params, batch_stats, opt_state, initial_steps)
        self.state.steps = put(self.state.steps)
        self._param_count = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        self.logger.info(
            "Initialised model with %.2fM parameters on mesh %s",
            self._param_count / 1e6,
            dict(zip(self.mesh.axis_names, self.mesh.devices.shape)),
        )

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    @property
    def steps(self) -> int:
        return int(self.state.steps)

    def _apply_fn(self):
        """Model apply, optionally wrapped in rematerialisation."""
        lambda_f0 = float(self.loss_config.get("lambda_f0", 0.1))
        model = self.model

        def forward(params, batch_stats, x, dropout_rng, train: bool):
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                (f0_pred, sil_pred), mutated = model.apply(
                    variables,
                    x,
                    train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
                return f0_pred, sil_pred, mutated["batch_stats"]
            f0_pred, sil_pred = model.apply(variables, x, train=False)
            return f0_pred, sil_pred, batch_stats

        if self.gradient_checkpointing:
            forward = jax.checkpoint(forward, static_argnums=(4,))
        return forward, lambda_f0

    def _features(self, mels):
        """Batch -> NHWC model input.

        3-D/4-D input: collated host mels (B, 1, M, T) (reference contract).
        2-D input: raw waveform crops (B, samples) — the on-device front-end
        runs the GEMM mel + log-norm inside the compiled step.
        """
        if mels.dtype != jnp.float32:
            mels = mels.astype(jnp.float32)  # bf16 transfer -> f32 compute entry
        if mels.ndim == 2:
            mp = self.mel_params
            mel = mel_spectrogram_gemm(
                mels,
                mp["sample_rate"],
                mp["n_fft"],
                mp["win_length"],
                mp["hop_length"],
                mp["n_mels"],
            )  # (B, M, T)
            mel = (jnp.log(MEL_LOG_OFFSET + mel) - MEL_MEAN) / MEL_STD
            return jnp.transpose(mel, (0, 2, 1))[..., None]  # (B, T, M, 1)
        return jnp.transpose(mels, (0, 3, 2, 1))  # (B,1,M,T) -> (B,T,M,1)

    def _build_train_step(self):
        forward, lambda_f0 = self._apply_fn()
        tx = self.tx
        base_rng = self._dropout_rng
        matmul_precision = "bfloat16" if self.use_mixed_precision else "highest"

        def train_step(params, batch_stats, opt_state, steps, mels, f0, sil):
            with jax.default_matmul_precision(matmul_precision):
                x = self._features(mels)
                dropout_rng = jax.random.fold_in(base_rng, steps)

                def loss_fn(p):
                    f0_pred, sil_pred, new_stats = forward(p, batch_stats, x, dropout_rng, True)
                    loss, loss_f0, loss_sil = jdc_loss(f0_pred, sil_pred, f0, sil, lambda_f0)
                    return loss, (loss_f0, loss_sil, new_stats)

                (loss, (loss_f0, loss_sil, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, new_opt_state = tx.update(grads, opt_state, params)
                new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
                metrics = {"loss": loss, "f0": loss_f0, "sil": loss_sil}
                return new_params, new_stats, new_opt_state, steps + 1, metrics

        # shardings are inherited from the committed arguments (params carry
        # their TP/replicated placement; batches are device_put on 'data')
        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

    def _build_eval_step(self):
        forward, lambda_f0 = self._apply_fn()
        matmul_precision = "bfloat16" if self.use_mixed_precision else "highest"

        def eval_step(params, batch_stats, mels, f0, sil, valid):
            with jax.default_matmul_precision(matmul_precision):
                x = self._features(mels)
                f0_pred, sil_pred, _ = forward(
                    params, batch_stats, x, jax.random.PRNGKey(0), False
                )
                loss, loss_f0, loss_sil = jdc_loss_masked(
                    f0_pred, sil_pred, f0, sil, lambda_f0, valid
                )
                return {"loss": loss, "f0": loss_f0, "sil": loss_sil}

        return jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _put_batch(self, batch):
        """-> (mels, f0s, sils, valid) on device; ``valid`` is a (B,) float
        mask that is 0 on rows added to pad the batch to a mesh multiple
        (drop_last loaders avoid padding on the train path; eval tails land
        here and the pad rows are masked out of the eval means)."""
        mels, f0s, sils = batch
        n_dev = self.mesh.devices.size
        b = mels.shape[0]
        valid = np.ones((b,), dtype=np.float32)
        if b % n_dev:
            pad = n_dev - b % n_dev
            mels = np.concatenate([mels, np.repeat(mels[-1:], pad, axis=0)])
            f0s = np.concatenate([f0s, np.repeat(f0s[-1:], pad, axis=0)])
            sils = np.concatenate([sils, np.repeat(sils[-1:], pad, axis=0)])
            valid = np.concatenate([valid, np.zeros((pad,), dtype=np.float32)])
        put = partial(jax.device_put, device=self._batch_sharding)
        mels = np.asarray(mels)
        if self.use_mixed_precision and mels.dtype == np.float32:
            # halve the per-step host->device transfer (a co-bottleneck over
            # remote transports): mels are consumed under bf16 matmul
            # precision anyway, so shipping them as bf16 loses nothing the
            # compute path keeps.  Targets (f0/sil) stay f32.
            mels = mels.astype(jnp.bfloat16)
        return (
            put(mels),
            put(np.asarray(f0s)),
            put(np.asarray(sils)),
            put(valid),
        )

    def _prefetch_placed(self, iterable):
        """Yield ``(placed, raw)`` pairs with the host->device copy of each
        next batch submitted one step ahead on a worker thread, so it rides
        along the current step's compute.  Over remote transports the copy
        is otherwise a *serial* per-step cost (device_put blocks until the
        bytes are on the wire), and it measures as large as the compute
        itself at B=64 (RESULTS.md round-2 bench)."""
        from concurrent.futures import ThreadPoolExecutor

        it = iter(iterable)
        with ThreadPoolExecutor(max_workers=1) as pool:
            try:
                raw = next(it)
            except StopIteration:
                return
            fut = pool.submit(self._put_batch, raw)
            for nxt in it:
                placed = fut.result()
                fut = pool.submit(self._put_batch, nxt)
                yield placed, raw
                raw = nxt
            yield fut.result(), raw

    def run(self, batch) -> Dict[str, Any]:
        """One optimization step (reference trainer.py:219-252).

        Accepts a raw host batch ``(mels, f0, sil)`` or an already-placed
        4-tuple from ``_put_batch``/``_prefetch_placed``.  Returns *device*
        scalars: fetching them eagerly would force a device->host
        round-trip on every step (expensive over remote transports); the
        epoch loops stack and fetch them once per epoch.
        """
        placed = batch if len(batch) == 4 else self._put_batch(batch)
        mels, f0s, sils, _ = placed
        s = self.state
        params, stats, opt_state, steps, metrics = self._train_step(
            s.params, s.batch_stats, s.opt_state, s.steps, mels, f0s, sils
        )
        self.state = TrainState.from_tuple((params, stats, opt_state, steps))
        return metrics

    @staticmethod
    def get_gradient_norm(grads) -> float:
        """Global L2 norm of a gradient pytree (reference trainer.py:197-205)."""
        leaves = jax.tree_util.tree_leaves(grads)
        total = sum(float(jnp.sum(jnp.square(g))) for g in leaves)
        return float(np.sqrt(total))

    @staticmethod
    def length_to_mask(lengths) -> jnp.ndarray:
        """(B,) lengths -> (B, max_len) bool mask, True beyond each length
        (reference trainer.py:207-211)."""
        lengths = jnp.asarray(lengths)
        positions = jnp.arange(int(lengths.max()))[None, :]
        return positions + 1 > lengths[:, None]

    def _get_lr(self) -> float:
        if self.schedule is None:
            return 0.0
        return float(self.schedule(max(self.steps - 1, 0)))

    @staticmethod
    def _progress(iterable, desc):
        try:
            from tqdm import tqdm

            return tqdm(iterable, desc=desc, leave=False)
        except ImportError:  # pragma: no cover
            return iterable

    def _train_epoch(self) -> Dict[str, float]:
        """(reference trainer.py:254-265)"""
        self.epochs += 1
        train_losses = defaultdict(list)
        t0 = time.time()
        n_items = 0
        for placed, batch in self._progress(
            self._prefetch_placed(self.train_dataloader), "[train]"
        ):
            losses = self.run(placed)
            n_items += batch[0].shape[0]
            for key, value in losses.items():
                train_losses[f"train/{key}"].append(value)
        # one device->host fetch for the whole epoch's metrics
        train_losses = {
            key: np.asarray(jnp.stack(value)) for key, value in train_losses.items()
        }
        elapsed = max(time.time() - t0, 1e-9)
        results = {key: float(np.mean(value)) for key, value in train_losses.items()}
        results["train/learning_rate"] = self._get_lr()
        results["train/utterances_per_second"] = n_items / elapsed
        return results

    def _eval_epoch(self) -> Dict[str, float]:
        """(reference trainer.py:267-291)"""
        eval_losses = defaultdict(list)
        weights = []
        for placed, batch in self._progress(
            self._prefetch_placed(self.val_dataloader), "[eval]"
        ):
            mels, f0s, sils, valid = placed
            metrics = self._eval_step(
                self.state.params, self.state.batch_stats, mels, f0s, sils, valid
            )
            weights.append(batch[0].shape[0])
            for key, value in metrics.items():
                eval_losses[f"eval/{key}"].append(value)
        # batch means weighted by true (unpadded) batch sizes
        w = np.asarray(weights, dtype=np.float64)
        return {
            key: float(np.average(np.asarray(jnp.stack(value)), weights=w))
            for key, value in eval_losses.items()
        }

    # ------------------------------------------------------------------
    def save_checkpoint(
        self, checkpoint_path: str, async_save: Optional[bool] = None
    ) -> None:
        training_cfg = self.config.get("training") or {}
        if async_save is None:
            async_save = bool(training_cfg.get("async_checkpoints", False))
        # Checkpoints must be self-describing: when the trainer was built
        # without a full config (library use, experiments), derive the model
        # architecture from the live module so infer.load_model rebuilds the
        # exact head instead of tolerant-merging into the default one.
        model_params = self.config.get("model_params") or {
            "num_class": int(self.model.num_class),
            "sequence_model": dict(self.model.sequence_model_config or {}),
        }
        ckpt_lib.save_checkpoint(
            checkpoint_path,
            self.state.params,
            self.state.batch_stats,
            self.state.opt_state,
            steps=self.steps,
            epochs=self.epochs,
            extra_meta={"model_params": model_params},
            async_save=async_save,
            backend=str(training_cfg.get("checkpoint_backend", "msgpack")),
        )

    def load_checkpoint(self, checkpoint_path: str, load_only_params: bool = False) -> None:
        params, batch_stats, opt_state, steps, epochs = ckpt_lib.load_checkpoint(
            checkpoint_path,
            self.state.params,
            self.state.batch_stats,
            self.state.opt_state,
            load_only_params=load_only_params,
        )
        put = partial(jax.device_put, device=self._replicated)
        self.state = TrainState(
            place_params(params, self._param_shardings),
            jax.tree_util.tree_map(put, batch_stats),
            jax.tree_util.tree_map(put, opt_state),
            steps,
        )
        if not load_only_params:
            self.epochs = epochs
