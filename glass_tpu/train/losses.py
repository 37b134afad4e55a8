"""Training losses.

Implements the reference loss family:

* ``smooth_l1`` (fvcore semantics),
* the periodic rotated-box regression losses ``sine_loss`` / ``cosine_loss``
  / ``sine_square_loss`` (reference ``glass/modeling/losses/
  rotated_box_losses.py:14-69``): smooth-L1 on (dx,dy,dw,dh) plus
  ``w_a * f((da_pred - da_gt)/w_a)``,
* masked cross-entropy helpers used by the box/orientation/decoder heads.

All reductions are expressed as weighted sums so padded (invalid) rows can
be masked without dynamic shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1 (beta=0 -> pure L1), fvcore convention."""
    diff = jnp.abs(pred - target)
    if beta < 1e-5:
        return diff
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def _angle_loss(
    fn, pred_deltas: jnp.ndarray, gt_deltas: jnp.ndarray, beta: float,
    weights: Sequence[float],
) -> jnp.ndarray:
    """Per-row loss (..., 5) -> (..., 5): smooth-L1 xywh + periodic angle."""
    box_l1 = smooth_l1(pred_deltas[..., :4], gt_deltas[..., :4], beta)
    angle_weight = weights[4]
    angle_diff = (pred_deltas[..., 4] - gt_deltas[..., 4]) / angle_weight
    angle_l = angle_weight * fn(angle_diff)
    return jnp.concatenate([box_l1, angle_l[..., None]], axis=-1)


def sine_square_loss(pred, gt, beta, weights):
    return _angle_loss(lambda x: jnp.sin(x) ** 2, pred, gt, beta, weights)


def sine_loss(pred, gt, beta, weights):
    return _angle_loss(lambda x: jnp.abs(jnp.sin(x)), pred, gt, beta, weights)


def cosine_loss(pred, gt, beta, weights):
    return _angle_loss(lambda x: jnp.abs(1.0 - jnp.cos(x)), pred, gt, beta, weights)


BOX_REG_LOSSES = {
    "smooth_l1": lambda p, g, beta, w: smooth_l1(p, g, beta),
    "sine_square_loss": sine_square_loss,
    "sine_loss": sine_loss,
    "cosine_loss": cosine_loss,
}


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean softmax CE over rows where ``mask`` is True (0 if none)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def masked_bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean binary CE over masked elements (matches torch BCEWithLogits)."""
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, loss, 0.0)) / denom


def decoder_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, word_mask: jnp.ndarray
) -> jnp.ndarray:
    """Recognizer CE: ignore_index=0, targets shifted by one.

    Matches reference ``recognizer_head_v2.decoder_loss:44-50``:
    ``CE(preds.view(-1, V), targets[:, 1:].view(-1), ignore_index=0)``.

    Args:
        logits: (N, T, V) teacher-forced outputs.
        targets: (N, T + 1) encoded labels (leading GO slot).
        word_mask: (N,) valid-word mask (padding words contribute nothing).
    """
    tgt = targets[:, 1 : logits.shape[1] + 1].astype(jnp.int32)
    mask = (tgt != 0) & word_mask[:, None]
    return masked_cross_entropy(
        logits.reshape(-1, logits.shape[-1]), tgt.reshape(-1), mask.reshape(-1)
    )


def ctc_loss_masked(
    logits: jnp.ndarray, targets: jnp.ndarray, word_mask: jnp.ndarray
) -> jnp.ndarray:
    """CTC negative log-likelihood averaged over valid words.

    Args:
        logits: (N, T, V) per-timestep logits (blank = index 0, matching
            the codec's ctc charset layout).
        targets: (N, L) encoded labels, 0-padded (no GO/STOP in ctc mode).
        word_mask: (N,) valid-word mask.
    """
    import optax

    logits = logits.astype(jnp.float32)
    logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
    label_paddings = (targets == 0).astype(jnp.float32)
    per_word = optax.ctc_loss(
        logits, logit_paddings, targets.astype(jnp.int32), label_paddings
    )
    w = word_mask.astype(jnp.float32)
    return jnp.sum(per_word * w) / jnp.maximum(jnp.sum(w), 1.0)
