"""Aspect-ratio-preserving pooler padding (FeatPadV2).

Reference ``glass/modeling/recognition/recognizer_pooler_pad.py:28-95``:
when a word box is narrower than the pooler's target aspect, widen the box
symmetrically before pooling and zero out the columns that came from the
padding afterwards.  Off in the released configs
(``POOLER_PAD.NAME: ''``) but part of the model family surface.

The reference operates on axis-aligned (x1, y1, x2, y2) boxes; this
framework's pooler consumes rotated XYWHA boxes, where the equivalent
operation is simply widening ``w`` (the box frame handles the rest) — a
strict generalization that coincides for angle 0.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def feat_pad_v2_boxes(
    boxes: jnp.ndarray, output_size: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Widen narrow boxes to the pooler aspect.

    Args:
        boxes: (R, 5) XYWHA.
        output_size: (pooled_h, pooled_w).

    Returns:
        (widened_boxes, dst_src_ratio): ratio > 1 marks widened rows.
    """
    dst_aspect = output_size[1] / output_size[0]
    w, h = boxes[:, 2], boxes[:, 3]
    src_aspect = w / jnp.maximum(h, 1e-6)
    ratio = dst_aspect / jnp.maximum(src_aspect, 1e-6)
    new_w = jnp.where(ratio > 1, w * ratio, w)
    out = boxes.at[:, 2].set(new_w)
    return out, ratio


def feat_pad_v2_mask(
    pooled: jnp.ndarray, ratio: jnp.ndarray
) -> jnp.ndarray:
    """Zero the pooled columns contributed by padding.

    pooled: (R, ph, pw, C); ratio from ``feat_pad_v2_boxes``.
    """
    pw = pooled.shape[2]
    pad_cols = jnp.where(ratio > 1, (ratio - 1) / ratio * pw / 2.0, 0.0)  # (R,)
    col = jnp.arange(pw, dtype=pooled.dtype)[None, :]
    keep = (col >= pad_cols[:, None]) & (col < (pw - pad_cols)[:, None])  # (R, pw)
    return pooled * keep[:, None, :, None].astype(pooled.dtype)
