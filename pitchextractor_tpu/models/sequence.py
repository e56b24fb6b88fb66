"""Temporal sequence heads: BiLSTM and Transformer.

Re-designs the reference ``SequenceModel`` (model.py:196-256) for XLA:

- **BiLSTM**: torch's cuDNN ``nn.LSTM`` has no XLA analog (SURVEY.md §7
  hard-part #1).  Here the input projection for *all* timesteps is hoisted
  out of the recurrence into one large ``(B·T, D) @ (D, 4H)`` matmul that XLA
  tiles onto the MXU; the ``lax.scan`` body only carries the hidden-state
  projection and the pointwise gate math.  Bidirectional = two scans (one
  ``reverse=True``) sharing the pattern.
- **Transformer**: pre-LayerNorm'd sinusoidal-position encoder stack matching
  the reference's ``nn.TransformerEncoder`` (post-norm layers, GELU,
  batch-first).  Attention is ``jax.nn.dot_product_attention`` shapes that
  XLA fuses; the sequence axis is shardable for later sequence parallelism
  (SURVEY.md §5.7).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import flax.linen as nn

from .init import kaiming_uniform, normal_std1, orthogonal, zeros


def _lstm_use_pallas() -> bool:
    """Use the Pallas recurrence kernel on TPU backends unless disabled."""
    import os

    if os.environ.get("PEX_DISABLE_PALLAS_LSTM"):
        return False
    try:
        import jax as _jax

        return _jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _proj_bf16_active(train: bool) -> bool:
    """bf16 input-projection matmuls: training-path only, TPU only.

    Inference (and therefore the torch forward-parity gate,
    tests/test_reference_parity.py) keeps the f32 einsum."""
    from ..ops.lstm_pallas import _use_bf16_proj

    return bool(train) and _use_bf16_proj() and _lstm_use_pallas()


class LSTMLayer(nn.Module):
    """One unidirectional LSTM layer over (B, T, D) -> (B, T, H).

    The input projection for all timesteps is hoisted into one MXU matmul;
    the recurrence runs either as a ``lax.scan`` (CPU / fallback) or as the
    Pallas kernel (ops/lstm_pallas.py) that keeps the carry in VMEM.
    """

    hidden_size: int
    reverse: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        project_only: bool = False,
        bf16_proj: bool = False,
        time_major: bool = False,
    ):
        """``time_major=True`` takes/returns (T, B, ·) and skips the per-layer
        transposes — the round-3 trace put ~1.5 ms/step of relayout copies in
        the (B,T)<->(T,B) swaps around every fused layer; the fused-head path
        (models/jdc.py) now stays time-major end-to-end."""
        if time_major:
            T, B, D = x.shape
        else:
            B, T, D = x.shape
        H = self.hidden_size
        # torch LSTM parameter layout: weight_ih (4H, D), weight_hh (4H, H),
        # bias_ih + bias_hh (4H,) each, gate order [i, f, g, o].
        w_ih = self.param("w_ih", orthogonal, (D, 4 * H))
        w_hh = self.param("w_hh", orthogonal, (H, 4 * H))
        b_ih = self.param("b_ih", normal_std1, (4 * H,))
        b_hh = self.param("b_hh", normal_std1, (4 * H,))

        # hoist the input projection out of the scan: one MXU matmul.
        # Training on TPU runs it (and its dx/dW grads) with bf16 operands
        # and stores the projection stream bf16 (ops/lstm_pallas.py
        # projection_matmul — ~19 ms/step of f32 matmul fusions in the
        # leg-10 trace); bias adds and accumulation stay f32.  The einsum
        # contracts the last axis either way, so the same call serves both
        # (B,T,D) and (T,B,D) inputs.
        if bf16_proj:
            from ..ops.lstm_pallas import projection_matmul

            x_proj = (projection_matmul(x, w_ih) + b_ih + b_hh).astype(jnp.bfloat16)
        else:
            x_proj = jnp.einsum("btd,dh->bth", x, w_ih) + b_ih + b_hh
        if not time_major:
            x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) time-major

        if project_only:
            # fused bidirectional path: the parent runs the recurrence
            return x_proj, w_hh

        from ..ops.lstm_pallas import lane_aligned, pallas_vmem_fits

        if _lstm_use_pallas() and lane_aligned(H) and pallas_vmem_fits(1, B, H):
            from ..ops.lstm_pallas import lstm_layer_pallas

            hs = lstm_layer_pallas(x_proj, w_hh, reverse=self.reverse)
            return jnp.swapaxes(hs, 0, 1)

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

        init = (
            jnp.zeros((B, H), x_proj.dtype),
            jnp.zeros((B, H), x_proj.dtype),
        )
        _, hs = lax.scan(step, init, x_proj, reverse=self.reverse)
        return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


class BiLSTM(nn.Module):
    """Stacked (bi)directional LSTM (reference model.py:218-228).

    Layers are setup-defined attributes (``l{k}_fwd`` / ``l{k}_bwd``) so a
    parent module can reach individual layers for cross-head kernel fusion
    (models/jdc.py) while the parameter tree stays identical to the compact
    formulation (and to the torch checkpoint converter's mapping).
    """

    hidden_size: int = 384
    num_layers: int = 2
    dropout: float = 0.3
    bidirectional: bool = True

    def setup(self):
        for k in range(self.num_layers):
            setattr(self, f"l{k}_fwd", LSTMLayer(self.hidden_size))
            if self.bidirectional:
                setattr(self, f"l{k}_bwd", LSTMLayer(self.hidden_size, reverse=True))
        self.inter_dropout = nn.Dropout(self.dropout)

    def layer_pair(self, k: int):
        return getattr(self, f"l{k}_fwd"), getattr(self, f"l{k}_bwd")

    def __call__(self, x, train: bool = False):
        h = x
        from ..ops.lstm_pallas import lane_aligned, pallas_vmem_fits

        # the kernel slices gate blocks of width H on the lane axis, so the
        # hidden size must align to the 128-lane tiling; the 2-chain kernel
        # must also fit scoped VMEM at this batch size
        fused = (
            self.bidirectional
            and _lstm_use_pallas()
            and lane_aligned(self.hidden_size)
            and pallas_vmem_fits(2, x.shape[0], self.hidden_size)
        )
        pb = _proj_bf16_active(train)
        for layer in range(self.num_layers):
            fwd_layer = getattr(self, f"l{layer}_fwd")
            if fused:
                # fused kernel: both directions advance in one sequential
                # loop (ops/lstm_pallas.py bilstm_layer_pallas)
                from ..ops.lstm_pallas import bilstm_layer_pallas

                bwd_layer = getattr(self, f"l{layer}_bwd")
                xp_fwd, w_fwd = fwd_layer(h, project_only=True, bf16_proj=pb)
                xp_bwd, w_bwd = bwd_layer(h, project_only=True, bf16_proj=pb)
                x_proj2 = jnp.stack([xp_fwd, jnp.flip(xp_bwd, axis=0)], axis=1)
                h = jnp.swapaxes(bilstm_layer_pallas(x_proj2, w_fwd, w_bwd), 0, 1)
            elif self.bidirectional:
                fwd = fwd_layer(h, bf16_proj=pb)
                bwd = getattr(self, f"l{layer}_bwd")(h, bf16_proj=pb)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd_layer(h, bf16_proj=pb)
            if layer < self.num_layers - 1 and self.dropout > 0:
                h = self.inter_dropout(h, deterministic=not train)
        return h

    @property
    def output_dim(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)


class SinusoidalPositionalEncoding(nn.Module):
    """Batch-first sinusoidal PE buffer (reference model.py:178-193)."""

    d_model: int
    max_len: int = 2000

    def setup(self):
        position = np.arange(self.max_len, dtype=np.float64)[:, None]
        div_term = np.exp(
            np.arange(0, self.d_model, 2, dtype=np.float64)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = np.zeros((self.max_len, self.d_model), dtype=np.float64)
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)
        self.pe = jnp.asarray(pe[None, :, :], dtype=jnp.float32)

    def __call__(self, x):
        seq_len = x.shape[1]
        return x + self.pe[:, :seq_len]


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer matching torch ``nn.TransformerEncoderLayer``
    (batch_first, activation=gelu)."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        deterministic = not train
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attn",
        )(x, x)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        h = nn.Dense(self.dim_feedforward, kernel_init=kaiming_uniform, name="ff1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, kernel_init=kaiming_uniform, name="ff2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class TransformerEncoder(nn.Module):
    """PE + LayerNorm + encoder stack (reference model.py:229-241,253-255)."""

    d_model: int = 512
    num_layers: int = 2
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    max_len: int = 2000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SinusoidalPositionalEncoding(self.d_model, self.max_len, name="pos")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="input_norm")(x)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                name=f"layer{i}",
            )(x, train=train)
        return x


class SequenceModel(nn.Module):
    """Switchable temporal block (reference model.py:196-256).

    Config keys mirror the reference ``sequence_model`` section
    (Configs/config.yml:18-24): model_type, hidden_size, num_layers,
    dropout, bidirectional, nhead, dim_feedforward, max_len.
    """

    input_size: int = 512
    model_type: str = "bilstm"
    hidden_size: int = 384
    num_layers: int = 2
    dropout: float = 0.3
    bidirectional: bool = True
    nhead: int = 8
    dim_feedforward: int = 1024
    max_len: int = 2000

    def setup(self):
        kind = self.model_type.lower()
        if kind == "bilstm":
            # torch nn.LSTM applies inter-layer dropout only when num_layers>1
            lstm_dropout = self.dropout if self.num_layers > 1 else 0.0
            self.bilstm = BiLSTM(
                hidden_size=self.hidden_size,
                num_layers=self.num_layers,
                dropout=lstm_dropout,
                bidirectional=self.bidirectional,
            )
        elif kind == "transformer":
            self.transformer = TransformerEncoder(
                d_model=self.input_size,
                num_layers=self.num_layers,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                max_len=self.max_len,
            )
        else:
            raise ValueError(f"Unsupported sequence model type: {self.model_type}")

    def __call__(self, x, train: bool = False):
        if self.model_type.lower() == "bilstm":
            return self.bilstm(x, train=train)
        return self.transformer(x, train=train)

    @property
    def output_dim(self) -> int:
        if self.model_type.lower() == "bilstm":
            return self.hidden_size * (2 if self.bidirectional else 1)
        return self.input_size


def sequence_model_from_config(config: Optional[dict], name: Optional[str] = None) -> SequenceModel:
    """Build a SequenceModel from the YAML ``sequence_model`` mapping.

    ``name=None`` for setup-attribute naming (the attribute name becomes the
    module name); pass an explicit name only from compact contexts.
    """
    cfg = dict(config or {})
    cfg.setdefault("input_size", 512)
    known = {
        "input_size",
        "model_type",
        "hidden_size",
        "num_layers",
        "dropout",
        "bidirectional",
        "nhead",
        "dim_feedforward",
        "max_len",
    }
    cfg = {k: v for k, v in cfg.items() if k in known}
    if name is not None:
        return SequenceModel(name=name, **cfg)
    return SequenceModel(**cfg)
