"""Rotated non-maximum suppression with static shapes.

Replaces detectron2's ``nms_rotated`` / ``batched_nms_rotated`` CUDA kernels
(reference call sites: ``rotated_fast_rcnn.py:131``,
``post_processor_rotated_boxes.py:181``, RPN proposal selection).

TPU-native formulation: sort by score, precompute the NxN rotated IoU matrix,
then run the exact greedy suppression as a ``fori_loop`` over score rank.
Invalid (padding) entries are fed in with score ``-inf`` and are never kept.
Outputs are a fixed-size keep mask rather than a dynamic index list.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou_rotated import pairwise_iou_rotated

NEG_INF = -1e30
_TRI_CHUNK = 128


def _upper_triangle_iou(sorted_boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, N) IoU with only the strict upper triangle computed.

    NMS only consumes suppression relations from higher- to lower-ranked
    boxes, so the lower triangle (half the polygon-clipping work) is skipped
    by evaluating per-row-chunk column suffixes (static shapes per chunk).
    """
    n = sorted_boxes.shape[0]
    if n <= _TRI_CHUNK:
        return pairwise_iou_rotated(sorted_boxes, sorted_boxes)
    out = jnp.zeros((n, n), jnp.float32)
    for start in range(0, n, _TRI_CHUNK):
        stop = min(start + _TRI_CHUNK, n)
        rows = sorted_boxes[start:stop]
        cols = sorted_boxes[start:]
        out = out.at[start:stop, start:].set(pairwise_iou_rotated(rows, cols))
    return out


@partial(jax.jit, static_argnames=("max_keep",))
def nms_rotated_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    max_keep: int | None = None,
) -> jnp.ndarray:
    """Exact greedy rotated NMS.

    Args:
        boxes: (N, 5) XYWHA boxes (padding rows arbitrary).
        scores: (N,) scores; padding rows should be very negative or masked
            out via ``valid``.
        iou_threshold: suppress boxes with IoU > threshold w.r.t. a kept,
            higher-scoring box.
        valid: optional (N,) bool mask of real entries.
        max_keep: optionally keep only the top-k survivors (by score).

    Returns:
        (N,) bool keep mask aligned with the *input* order.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_valid = scores[order] > NEG_INF / 2

    iou = _upper_triangle_iou(sorted_boxes)
    rank = jnp.arange(n)

    # Greedy NMS as a fixpoint: keep(i) <=> valid(i) and no higher-ranked
    # KEPT box overlaps it.  Iterating the all-at-once operator converges to
    # the exact greedy solution in (suppression chain depth) steps — a
    # handful in practice — with each step a single (N,)x(N,N) contraction
    # on the MXU, instead of N sequential loop iterations.
    sup = (
        (iou > iou_threshold)
        & (rank[:, None] < rank[None, :])
        & sorted_valid[:, None]
        & sorted_valid[None, :]
    ).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < n)

    def body(state):
        keep, _, it = state
        suppressed_by_kept = (keep.astype(jnp.float32) @ sup) > 0.5
        new_keep = sorted_valid & ~suppressed_by_kept
        return new_keep, keep, it + 1

    keep0 = sorted_valid
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )

    if max_keep is not None:
        kept_rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (kept_rank < max_keep)

    # Scatter back to input order.
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


@partial(jax.jit, static_argnames=("max_keep",))
def batched_nms_rotated_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    max_keep: int | None = None,
) -> jnp.ndarray:
    """Category-aware rotated NMS (detectron2 ``batched_nms_rotated``).

    Boxes of different ``idxs`` never suppress each other.  Implemented with
    the same coordinate-offset trick as the reference dependency: shift each
    category to a disjoint region of the plane before a single NMS pass.
    """
    max_coord = jnp.max(jnp.abs(boxes[:, :2])) + jnp.max(boxes[:, 2:4]) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes.at[:, 0].add(offsets)
    return nms_rotated_mask(shifted, scores, iou_threshold, valid=valid, max_keep=max_keep)
