"""Rotated region proposal network (RRPN) — TPU-native.

Covers the machinery the reference inherits from detectron2
(``RotatedAnchorGenerator`` + ``StandardRPNHead`` + ``RRPN`` proposal
selection, selected by ``configs/glass_pretrain.yaml:55-74``) plus the GLASS
loss override (``glass/modeling/proposal_generator/rotated_rpn.py:17-91``,
the sine-square periodic angle loss — see train/losses.py).

TPU design points:

* anchors are generated at trace time from static feature shapes,
* per-level top-k is static (``min(pre_nms_topk, H*W*A)``),
* NMS runs per level (the exact semantics of detectron2's
  ``batched_nms_rotated`` keyed by level) on fixed-size candidate sets,
* the output is a fixed-capacity ``(post_nms_topk,)`` padded proposal set
  with a validity mask — no dynamic shapes anywhere.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .context import Ctx
from ..ops.boxes import apply_deltas, clip_rotated_boxes, nonempty
from ..ops.nms_rotated import nms_rotated_mask, NEG_INF


def generate_cell_anchors(sizes, aspect_ratios, angles) -> np.ndarray:
    """detectron2 ``RotatedAnchorGenerator.generate_cell_anchors``."""
    anchors = []
    for size in sizes:
        area = size**2
        for aspect in aspect_ratios:
            w = math.sqrt(area / aspect)
            h = aspect * w
            for angle in angles:
                anchors.append([0.0, 0.0, w, h, angle])
    return np.array(anchors, np.float32)


def generate_anchors_for_level(
    grid_h: int, grid_w: int, stride: int, cell_anchors: np.ndarray, offset: float = 0.0
) -> np.ndarray:
    """(H*W*A, 5) anchors, location-major/anchor-minor (d2 ordering)."""
    shifts_x = (np.arange(grid_w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(grid_h, dtype=np.float32) + offset) * stride
    sy, sx = np.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = np.stack(
        [sx.ravel(), sy.ravel(), np.zeros(sx.size, np.float32),
         np.zeros(sx.size, np.float32), np.zeros(sx.size, np.float32)],
        axis=1,
    )
    anchors = shifts[:, None, :] + cell_anchors[None, :, :]
    return anchors.reshape(-1, 5)


def exact_top_k(x: jnp.ndarray, k: int, rows: int = 16):
    """Exact ``lax.top_k`` via a row-split reduction (~1.5x faster on TPU
    for the 700k-anchor P2 level; measured 3.65 -> 2.39 ms at k=1000).

    Split into ``rows`` chunks, take each chunk's top-k (any global top-k
    element is in its own chunk's top-k), then top-k over the rows*k
    survivors.  Tie order matches flat ``top_k`` (lower index first): chunks
    preserve index order internally and earlier chunks sort first.
    """
    n = x.shape[0]
    rows = min(rows, max(1, n // (8 * k)))
    if rows <= 1:
        return jax.lax.top_k(x, k)
    pad = (-n) % rows
    xp = jnp.pad(x, (0, pad), constant_values=-jnp.inf).reshape(rows, -1)
    sv, si = jax.lax.top_k(xp, k)  # (rows, k)
    base = (jnp.arange(rows) * xp.shape[1])[:, None]
    flat_i = (si + base).reshape(-1)
    gv, gi = jax.lax.top_k(sv.reshape(-1), k)
    return gv, flat_i[gi]


def rpn_head_apply(
    ctx: Ctx, params: dict, features: List[jnp.ndarray]
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """StandardRPNHead: shared 3x3 conv + 1x1 objectness / 1x1 deltas.

    Args:
        features: list of (N, H, W, C) per level.

    Returns:
        objectness: list of (N, H*W*A); deltas: list of (N, H*W*A, 5);
        both in the anchor ordering of ``generate_anchors_for_level``.
    """
    logits, deltas = [], []
    for f in features:
        t = L.conv2d(f, params["conv"]["weight"], params["conv"]["bias"], padding=1)
        t = jnp.maximum(t, 0)
        obj = L.conv2d(
            t, params["objectness_logits"]["weight"], params["objectness_logits"]["bias"]
        )  # (N, H, W, A)
        dlt = L.conv2d(
            t, params["anchor_deltas"]["weight"], params["anchor_deltas"]["bias"]
        )  # (N, H, W, A*5)
        n, h, w, a = obj.shape
        logits.append(obj.reshape(n, h * w * a))
        deltas.append(dlt.reshape(n, h * w * a, 5))
    return logits, deltas


def select_proposals_single_image(
    logits: List[jnp.ndarray],
    deltas: List[jnp.ndarray],
    anchors: List[jnp.ndarray],
    image_size: Tuple[int, int],
    bbox_reg_weights,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float,
    min_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Proposal selection for one image (vmap over batch outside).

    Args:
        logits: list of (H*W*A,) per level.
        deltas: list of (H*W*A, 5) per level.
        anchors: list of (H*W*A, 5) per level.

    Returns:
        boxes (post_nms_topk, 5), scores (post_nms_topk,),
        valid (post_nms_topk,) — sorted by score, padded.
    """
    all_boxes, all_scores, all_valid = [], [], []
    for lg, dl, an in zip(logits, deltas, anchors):
        k = min(pre_nms_topk, lg.shape[0])
        scores, idx = exact_top_k(lg, k)
        # decode in f32 regardless of the (possibly bf16) head dtype
        boxes = apply_deltas(dl[idx].astype(jnp.float32), an[idx], bbox_reg_weights)
        boxes = clip_rotated_boxes(boxes, image_size)
        valid = (
            jnp.isfinite(scores)
            & jnp.all(jnp.isfinite(boxes), axis=-1)
            & nonempty(boxes, min_size)
        )
        # Exact per-level NMS (batched_nms_rotated keyed by level in d2).
        keep = nms_rotated_mask(boxes, scores, nms_thresh, valid=valid)
        all_boxes.append(boxes)
        all_scores.append(jnp.where(keep, scores, NEG_INF))
        all_valid.append(keep)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)

    top_scores, top_idx = jax.lax.top_k(scores, post_nms_topk)
    return boxes[top_idx], top_scores, valid[top_idx] & (top_scores > NEG_INF / 2)


def init_rpn_head(key, in_channels: int, num_anchors: int, box_dim: int = 5) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "conv": {
            "weight": L.normal_init(ks[0], (3, 3, in_channels, in_channels), 0.01),
            "bias": jnp.zeros((in_channels,), jnp.float32),
        },
        "objectness_logits": {
            "weight": L.normal_init(ks[1], (1, 1, in_channels, num_anchors), 0.01),
            "bias": jnp.zeros((num_anchors,), jnp.float32),
        },
        "anchor_deltas": {
            "weight": L.normal_init(ks[2], (1, 1, in_channels, num_anchors * box_dim), 0.01),
            "bias": jnp.zeros((num_anchors * box_dim,), jnp.float32),
        },
    }
