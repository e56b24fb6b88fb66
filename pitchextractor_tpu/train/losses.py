"""Training losses with torch-parity semantics.

The reference composes ``lambda_f0 · SmoothL1Loss()(f0_pred.squeeze(), f0)
+ BCEWithLogitsLoss()(sil_pred, sil)`` (train.py:104-106, trainer.py:237-239).
Both torch losses default to mean reduction; SmoothL1 uses beta=1.0.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss (mean reduction, beta=1.0)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def bce_with_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCEWithLogitsLoss (mean reduction), numerically stable:
    max(x, 0) - x·z + log(1 + exp(-|x|))."""
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def jdc_loss(f0_pred, voicing_pred, f0, silence, lambda_f0: float = 0.1):
    """The combined JDC training loss (reference trainer.py:237-239).

    f0_pred: (B, T, num_class); squeezed like the reference when num_class==1.
    """
    f0_pred = jnp.squeeze(f0_pred, axis=-1) if f0_pred.shape[-1] == 1 else f0_pred
    loss_f0 = lambda_f0 * smooth_l1_loss(f0_pred, f0)
    loss_sil = bce_with_logits_loss(voicing_pred, silence)
    return loss_f0 + loss_sil, loss_f0, loss_sil


def jdc_loss_masked(f0_pred, voicing_pred, f0, silence, lambda_f0, row_weight):
    """``jdc_loss`` with a per-row weight (B,) excluding padded batch rows.

    Eval batches are padded to a mesh multiple by repeating the last sample
    (Trainer._put_batch); averaging over the padded batch would give the
    duplicated rows full weight.  With equal-length rows the reference's
    all-element mean equals the mean of per-row means, so weighting per-row
    means by ``row_weight`` is exact.
    """
    f0_pred = jnp.squeeze(f0_pred, axis=-1) if f0_pred.shape[-1] == 1 else f0_pred
    w = row_weight / jnp.maximum(jnp.sum(row_weight), 1e-9)

    diff = jnp.abs(f0_pred - f0)
    sl1_rows = jnp.mean(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5), axis=-1)
    loss_f0 = lambda_f0 * jnp.sum(w * sl1_rows)

    x, z = voicing_pred, silence
    bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss_sil = jnp.sum(w * jnp.mean(bce, axis=-1))
    return loss_f0 + loss_sil, loss_f0, loss_sil
