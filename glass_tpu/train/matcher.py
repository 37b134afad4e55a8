"""Box matching and balanced sampling with static shapes.

Replaces detectron2's ``Matcher`` (with the memory-chunked rotated-safe
patch the reference installs at import, ``glass/modeling/matcher.py:6-83``)
and ``subsample_labels``.  Everything is expressed over fixed-capacity
candidate sets with validity masks:

* ``match_rotated``: per-proposal max rotated IoU + threshold labeling,
  optionally with low-quality matches (each gt's best anchors become
  foreground regardless of threshold — RPN only),
* ``match_rotated_topk``: the anchor-scale variant that prefilters exact
  rotated IoU to each gt's top-K anchors by axis-aligned overlap (exact
  because zero AABB intersection implies zero rotated intersection),
* ``subsample_labels``: randomized balanced fg/bg selection as weight masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import rbox_to_box
from ..ops.iou_rotated import pairwise_iou_rotated


def _pairwise_aabb_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,4) x (N,4) XYXY -> (M,N) intersection areas (cheap prefilter)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def match_quality_rotated(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
) -> jnp.ndarray:
    """(G,5) x (P,5) -> (G,P) rotated IoU with invalid rows zeroed."""
    iou = pairwise_iou_rotated(gt_boxes, proposals)
    return iou * gt_valid[:, None] * prop_valid[None, :]


def matcher_assign(
    quality: jnp.ndarray,
    thresholds: Tuple[float, ...],
    labels: Tuple[int, ...],
    allow_low_quality: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 Matcher semantics on a (G, P) quality matrix.

    Returns (matched_idx (P,), match_labels (P,)) where match_labels uses the
    given label set (e.g. RPN: thresholds (0.3, 0.7) labels (0, -1, 1)).
    An all-zero quality column gets the lowest label (background).
    """
    matched_vals = jnp.max(quality, axis=0)
    matched_idx = jnp.argmax(quality, axis=0)

    match_labels = jnp.full(quality.shape[1], labels[0], jnp.int32)
    edges = list(thresholds)
    for lab, low, high in zip(
        labels, [0.0] + edges, edges + [float("inf")]
    ):
        in_range = (matched_vals >= low) & (matched_vals < high)
        match_labels = jnp.where(in_range, lab, match_labels)

    if allow_low_quality:
        # For each gt, proposals achieving (IoU == gt max) become fg
        # (the reference patch relaxes negatives via relu, matcher.py:66-68).
        best_per_gt = jnp.max(quality, axis=1, keepdims=True)
        is_best = (quality >= best_per_gt - 1e-5) & (best_per_gt > 1e-5)
        low_quality = jnp.any(is_best, axis=0)
        match_labels = jnp.where(low_quality, 1, match_labels)

    return matched_idx, match_labels


def match_rotated_sparse_topk(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    k: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse rotated IoU for anchor-scale matching.

    For RPN-scale anchor sets (~1e6) the dense G x A rotated-polygon clip is
    the reference's single most expensive CUDA kernel; anchors outside a
    gt's axis-aligned envelope provably have zero rotated IoU, and anchors
    with meaningful IoU rank at the top of the AABB-overlap ordering, so the
    exact computation is restricted to each gt's top-K anchors by
    axis-aligned intersection.

    Returns:
        iou: (G, K) exact rotated IoUs of the candidates.
        idx: (G, K) anchor indices of the candidates.
    """
    g = gt_boxes.shape[0]
    a = anchors.shape[0]
    k = min(k, a)
    gt_aabb = rbox_to_box(gt_boxes)
    an_aabb = rbox_to_box(anchors)
    inter = _pairwise_aabb_intersection(gt_aabb, an_aabb)  # (G, A)
    inter = inter * gt_valid[:, None]
    top_vals, top_idx = jax.lax.top_k(inter, k)  # (G, K)

    cand = anchors[top_idx.reshape(-1)].reshape(g, k, 5)
    iou = jax.vmap(lambda gt, c: pairwise_iou_rotated(gt[None], c)[0])(gt_boxes, cand)
    iou = jnp.where(top_vals > 0, iou, 0.0) * gt_valid[:, None]
    return iou, top_idx


def rpn_label_anchors(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    thresholds: Tuple[float, float] = (0.3, 0.7),
    k: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RRPN ``label_and_sample_anchors`` matching (before subsampling).

    Returns:
        labels: (A,) in {1 fg, 0 bg, -1 ignore} (low-quality matches applied).
        matched_gt: (A, 5) the gt box each anchor regresses to.
    """
    g, k_ = gt_boxes.shape[0], k
    iou, idx = match_rotated_sparse_topk(gt_boxes, gt_valid, anchors, k)
    a = anchors.shape[0]
    flat_idx = idx.reshape(-1)
    flat_iou = iou.reshape(-1)

    # Per-anchor max IoU (scatter-max) and argmax gt via packed keys.
    matched_vals = jnp.zeros((a,), jnp.float32).at[flat_idx].max(flat_iou)
    gt_ids = jnp.repeat(jnp.arange(g, dtype=jnp.int32), k_)
    packed = (flat_iou * 1e6).astype(jnp.int32) * 1024 + gt_ids
    packed_max = jnp.zeros((a,), jnp.int32).at[flat_idx].max(packed)
    matched_gt_idx = jnp.clip(packed_max % 1024, 0, g - 1)

    lo, hi = thresholds
    labels = jnp.where(matched_vals >= hi, 1, jnp.where(matched_vals >= lo, -1, 0))

    # Low-quality matches: each gt's best anchors become foreground.
    best_per_gt = jnp.max(iou, axis=1, keepdims=True)
    is_best = (iou >= best_per_gt - 1e-5) & (best_per_gt > 1e-5)
    lq = jnp.zeros((a,), bool).at[flat_idx].max(is_best.reshape(-1))
    labels = jnp.where(lq, 1, labels)

    matched_gt = gt_boxes[matched_gt_idx]
    return labels, matched_gt


def subsample_labels(
    key: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 ``subsample_labels`` as boolean masks.

    labels: (N,) with 1 = positive, 0 = negative, -1 = ignore.
    Returns (pos_mask, neg_mask): randomly selected subsets with
    ``num_pos <= num_samples * positive_fraction`` and
    ``num_neg = min(#neg, num_samples - num_pos)``.
    """
    n = labels.shape[0]
    k1, k2 = jax.random.split(key)
    is_pos = labels == 1
    is_neg = labels == 0

    max_pos = int(num_samples * positive_fraction)
    num_pos_avail = jnp.sum(is_pos)
    num_pos = jnp.minimum(num_pos_avail, max_pos)
    num_neg = jnp.minimum(jnp.sum(is_neg), num_samples - num_pos)

    # Random priorities: valid entries get uniform keys, invalid -inf;
    # an entry is selected iff its rank among its class is < num_selected.
    def pick(mask, count, key):
        pri = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
        order = jnp.argsort(-pri)
        rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return mask & (rank < count)

    return pick(is_pos, num_pos, k1), pick(is_neg, num_neg, k2)
