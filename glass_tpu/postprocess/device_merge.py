"""On-device word-box merge post-processing.

The reference's merge-until-fixpoint loop
(``post_processor_rotated_boxes.py:108-184``) ping-pongs between CUDA IoA,
CPU ``cv2.minAreaRect`` per box and CUDA NMS every iteration — its single
hottest post-process path.  Here the same fixpoint runs entirely on device
over the fixed-capacity detection set:

* pair gating (IoA, height ratio, angle difference, valid scores) as dense
  (D, D) masks,
* merged boxes via the vectorized rotating-calipers min-area-rect over the
  union of both boxes' vertices (ops.min_area_rect), orientation
  disambiguated like the reference (including its radians-as-degrees angle
  selection quirk),
* suppression via the on-device rotated NMS,
* a bounded ``lax.while_loop`` replaces the unbounded Python ``while`` —
  the fixpoint converges in a handful of iterations in practice.

D <= 100, so every iteration is a few fused elementwise programs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import boxes_to_polygons, normalize_angle
from ..ops.iou_rotated import pairwise_ioa_rotated
from ..ops.min_area_rect import polygons_to_rotated_boxes
from ..ops.nms_rotated import nms_rotated_mask

MINIMAL_IOA_THRESH = 0.01


def _merge_pairs(boxes, scores, pair_mask):
    """For each box i, merge with its highest-priority partner j (if any).

    The reference merges every valid (i, j) pair per iteration by writing
    the merged box into both slots; iterating the fixpoint with one partner
    per box per iteration reaches the same fixpoint (subsequent iterations
    pick up remaining partners) while staying rank-stable on TPU.
    """
    d = boxes.shape[0]
    has_partner = jnp.any(pair_mask, axis=1)
    partner = jnp.argmax(pair_mask, axis=1)

    own_poly = boxes_to_polygons(boxes)                # (D, 4, 2)
    partner_poly = own_poly[partner]
    union_pts = jnp.concatenate([own_poly, partner_poly], axis=1)  # (D, 8, 2)

    # Reference angle selection (post_processor_rotated_boxes.py:202-208):
    # the higher-scoring box's angle, converted to radians but consumed in
    # degrees downstream — replicated verbatim.
    own_better = scores >= scores[partner]
    merged_angle = jnp.where(
        own_better, boxes[:, 4], boxes[partner, 4]
    ) * jnp.pi / 180.0

    merged = polygons_to_rotated_boxes(union_pts, orientations=merged_angle)
    return jnp.where(has_partner[:, None], merged, boxes), has_partner


@partial(jax.jit, static_argnames=("max_iters",))
def merge_intersecting_boxes_device(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    ioa_threshold: float = 0.3,
    height_ratio_thresh: float = 0.35,
    max_angle_diff: float = 15.0,
    valid_score: float = 0.15,
    max_iters: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixpoint merge over a padded (D,) detection set.

    Returns (boxes, valid): merged boxes with suppressed entries masked out.
    """

    def gate(boxes, scores, valid):
        ioa = pairwise_ioa_rotated(boxes, boxes)
        d = boxes.shape[0]
        eye = jnp.eye(d, dtype=bool)
        ioa = jnp.where(eye, 0.0, ioa)

        heights = boxes[:, 3]
        angles = boxes[:, 4]
        angle_diff = jnp.abs(normalize_angle(angles[None, :] - angles[:, None]))
        similar_angle = (angle_diff < max_angle_diff) | (
            angle_diff > 180.0 - max_angle_diff
        )
        hr = heights[None, :] / jnp.maximum(heights[:, None], 1e-6)
        similar_height = (hr > height_ratio_thresh) & (
            hr < 1.0 / (height_ratio_thresh + 1e-6)
        )
        score_ok = (scores[:, None] >= valid_score) & (scores[None, :] >= valid_score)
        both_valid = valid[:, None] & valid[None, :]
        return (
            (ioa >= ioa_threshold)
            & similar_angle
            & similar_height
            & score_ok
            & both_valid
        )

    def cond(state):
        boxes, valid, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        boxes, valid, it, _ = state
        pair_mask = gate(boxes, scores, valid)
        merged, had_partner = _merge_pairs(boxes, scores, pair_mask)
        keep = nms_rotated_mask(merged, scores, 0.99, valid=valid)
        return merged, keep, it + 1, jnp.any(had_partner)

    boxes, valid, _, _ = jax.lax.while_loop(
        cond, body, (boxes, valid, jnp.int32(0), jnp.array(True))
    )
    return boxes, valid
