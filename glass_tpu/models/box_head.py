"""Rotated Fast R-CNN box head and output layers.

Covers the reference's inherited ``FastRCNNConvFCHead`` (2xFC 2048,
``configs/glass_pretrain.yaml:89-100``) plus the GLASS
``RotatedFastRCNNOutputLayers`` (``glass/modeling/roi_heads/
rotated_fast_rcnn.py:494-638``): linear classifier (K+1), rotated box deltas
(5K), and the 4-way cardinal orientation head.

Inference follows ``fast_rcnn_inference_single_image_rotated``
(``rotated_fast_rcnn.py:88-148``) with static shapes: finite filter, clip,
score threshold, optional orientation overwrite onto box angles
(``RotatedFastRCNNOutputs.inference:344-373``), rotated NMS, top-k — all as
masks over a fixed-capacity detection set.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx
from ..ops.boxes import clip_rotated_boxes, overwrite_orientations_on_boxes
from ..ops.nms_rotated import nms_rotated_mask, NEG_INF


class Detections(NamedTuple):
    """Fixed-capacity per-image detection set (padded, mask-valid)."""

    boxes: jnp.ndarray        # (D, 5) XYWHA
    scores: jnp.ndarray       # (D,)
    classes: jnp.ndarray      # (D,) int32
    orientations: jnp.ndarray  # (D, 2): [argmax orientation, prob]
    valid: jnp.ndarray        # (D,) bool


def box_head_apply(ctx: Ctx, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """FastRCNNConvFCHead with NUM_FC=2: flatten -> fc1 -> relu -> fc2 -> relu.

    x: (R, ph, pw, C) pooled features -> (R, FC_DIM).

    Note: flattening must match torch's NCHW memory order for checkpoint
    compatibility, so transpose to (R, C, ph, pw) first.
    """
    r = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(r, -1)
    x = jnp.maximum(L.linear(x, params["fc1"]["weight"], params["fc1"]["bias"]), 0)
    x = jnp.maximum(L.linear(x, params["fc2"]["weight"], params["fc2"]["bias"]), 0)
    return x


def box_predictor_apply(
    ctx: Ctx, params: dict, x: jnp.ndarray, orientation_on: bool = True
):
    """-> (scores (R, K+1), deltas (R, 5K), orientation_logits (R, 4) | None)."""
    scores = L.linear(x, params["cls_score"]["weight"], params["cls_score"]["bias"])
    deltas = L.linear(x, params["bbox_pred"]["weight"], params["bbox_pred"]["bias"])
    orient = None
    if orientation_on:
        orient = L.linear(
            x, params["orientation_pred"]["weight"], params["orientation_pred"]["bias"]
        )
    return scores, deltas, orient


def fast_rcnn_inference_single_image(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    orientation_logits: jnp.ndarray | None,
    proposal_valid: jnp.ndarray,
    image_size: Tuple[int, int],
    score_thresh: float,
    nms_thresh: float,
    topk: int,
    apply_orientation_to_boxes: bool = True,
) -> Detections:
    """Static-shape counterpart of ``fast_rcnn_inference_single_image_rotated``.

    Args:
        boxes: (R, 5) decoded class-0 boxes (single foreground class).
        scores: (R, K+1) softmax class probabilities.
        orientation_logits: (R, 4) or None.
        proposal_valid: (R,) mask of real proposals.

    Returns fixed-capacity ``Detections`` with ``topk`` rows, score-sorted.
    """
    fg_scores = scores[:, 0]  # single 'word' class; background is last column

    if orientation_logits is not None:
        orient_probs = jax.nn.softmax(orientation_logits, axis=-1)
        orient_idx = jnp.argmax(orient_probs, axis=-1)
        orient_score = jnp.max(orient_probs, axis=-1)
        orientations = jnp.stack(
            [orient_idx.astype(fg_scores.dtype), orient_score], axis=-1
        )
        if apply_orientation_to_boxes:
            boxes = overwrite_orientations_on_boxes(boxes, orient_idx)
    else:
        orientations = jnp.zeros((boxes.shape[0], 2), fg_scores.dtype)

    finite = jnp.all(jnp.isfinite(boxes), axis=-1) & jnp.isfinite(fg_scores)
    boxes = jnp.where(finite[:, None], boxes, 0.0)
    boxes = clip_rotated_boxes(boxes, image_size)

    valid = proposal_valid & finite & (fg_scores > score_thresh)
    keep = nms_rotated_mask(boxes, fg_scores, nms_thresh, valid=valid, max_keep=topk)

    masked_scores = jnp.where(keep, fg_scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(masked_scores, topk)
    sel_valid = top_scores > NEG_INF / 2
    return Detections(
        boxes=boxes[top_idx],
        scores=jnp.where(sel_valid, top_scores, 0.0),
        classes=jnp.zeros((topk,), jnp.int32),
        orientations=orientations[top_idx],
        valid=sel_valid,
    )


def init_box_head(key, in_features: int, fc_dim: int = 2048) -> dict:
    ks = jax.random.split(key, 2)

    def fc(k, cin, cout):
        # d2 FastRCNNConvFCHead uses Caffe2XavierFill on FCs.
        fan_in = cin
        std = (1.0 / fan_in) ** 0.5
        return {
            "weight": std * jax.random.normal(k, (cout, cin), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    return {"fc1": fc(ks[0], in_features, fc_dim), "fc2": fc(ks[1], fc_dim, fc_dim)}


def init_box_predictor(
    key, in_features: int, num_classes: int = 1, orientation_on: bool = True
) -> dict:
    ks = jax.random.split(key, 3)
    params = {
        "cls_score": {
            "weight": L.normal_init(ks[0], (num_classes + 1, in_features), 0.01),
            "bias": jnp.zeros((num_classes + 1,), jnp.float32),
        },
        "bbox_pred": {
            "weight": L.normal_init(ks[1], (num_classes * 5, in_features), 0.001),
            "bias": jnp.zeros((num_classes * 5,), jnp.float32),
        },
    }
    if orientation_on:
        params["orientation_pred"] = {
            "weight": L.normal_init(ks[2], (4, in_features), 0.01),
            "bias": jnp.zeros((4,), jnp.float32),
        }
    return params
