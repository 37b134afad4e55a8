"""Rotated-box geometry in pure JAX (XYWHA_ABS convention).

A rotated box is ``(cx, cy, w, h, angle)`` with ``angle`` in degrees,
counter-clockwise in image coordinates (y pointing down) — the detectron2
convention the reference model family uses throughout.

Covers the reference behaviours of:
* ``glass/structures/boxes.py`` (box<->rbox, IoA identity),
* ``glass/utils/rotated_box_utils.py:4-35`` (orientation overwrite),
* ``glass/postprocess/post_processor_rotated_boxes.py:219-250`` (box->polygon),
* detectron2 ``RotatedBoxes.clip/scale/nonempty`` and
  ``Box2BoxTransformRotated.get_deltas/apply_deltas``.

Everything is shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

# detectron2 clamps dw/dh deltas to log(1000/16) before exp.
SCALE_CLAMP = math.log(1000.0 / 16.0)


def normalize_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """Map angles (degrees) into [-180, 180)."""
    return (angle + 180.0) % 360.0 - 180.0


def boxes_to_polygons(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) XYWHA boxes -> (..., 4, 2) polygons, first vertex top-left.

    Matches reference ``post_processor_rotated_boxes.py:219-250``.
    """
    cx, cy, w, h, a = jnp.moveaxis(boxes, -1, 0)
    t = (-a / 180.0) * jnp.pi
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    x0 = cx + (h * sin_t - w * cos_t) / 2
    x1 = cx + (h * sin_t + w * cos_t) / 2
    x2 = cx - (h * sin_t - w * cos_t) / 2
    x3 = cx - (h * sin_t + w * cos_t) / 2
    y0 = cy - (h * cos_t + w * sin_t) / 2
    y1 = cy - (h * cos_t - w * sin_t) / 2
    y2 = cy + (h * cos_t + w * sin_t) / 2
    y3 = cy + (h * cos_t - w * sin_t) / 2
    xs = jnp.stack([x0, x1, x2, x3], axis=-1)
    ys = jnp.stack([y0, y1, y2, y3], axis=-1)
    return jnp.stack([xs, ys], axis=-1)


def box_to_rbox(boxes: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned XYXY boxes (..., 4) -> XYWHA (..., 5) with angle 0."""
    x0, y0, x1, y1 = jnp.moveaxis(boxes, -1, 0)
    w = x1 - x0
    h = y1 - y0
    return jnp.stack([x0 + w / 2.0, y0 + h / 2.0, w, h, jnp.zeros_like(w)], axis=-1)


def rbox_to_box(rboxes: jnp.ndarray) -> jnp.ndarray:
    """XYWHA (..., 5) -> enclosing axis-aligned XYXY (..., 4)."""
    cx, cy, w, h, a = jnp.moveaxis(rboxes, -1, 0)
    c = jnp.abs(jnp.cos(a * jnp.pi / 180.0))
    s = jnp.abs(jnp.sin(a * jnp.pi / 180.0))
    new_w = c * w + s * h
    new_h = c * h + s * w
    return jnp.stack(
        [cx - new_w / 2, cy - new_h / 2, cx + new_w / 2, cy + new_h / 2], axis=-1
    )


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    return boxes[..., 2] * boxes[..., 3]


def clip_rotated_boxes(
    boxes: jnp.ndarray, image_size: Tuple[int, int], clip_angle_threshold: float = 1.0
) -> jnp.ndarray:
    """detectron2 ``RotatedBoxes.clip``: only nearly axis-aligned boxes
    (|angle| <= threshold) are clipped to the image, others pass through."""
    h_img, w_img = image_size
    cx, cy, w, h, a = jnp.moveaxis(boxes, -1, 0)
    x1 = jnp.clip(cx - w / 2.0, 0.0, w_img)
    y1 = jnp.clip(cy - h / 2.0, 0.0, h_img)
    x2 = jnp.clip(cx + w / 2.0, 0.0, w_img)
    y2 = jnp.clip(cy + h / 2.0, 0.0, h_img)
    clipped = jnp.stack(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1, a], axis=-1
    )
    nearly_aligned = (jnp.abs(a) <= clip_angle_threshold)[..., None]
    return jnp.where(nearly_aligned, clipped, boxes)


def scale_rotated_boxes(
    boxes: jnp.ndarray, scale_x: float, scale_y: float
) -> jnp.ndarray:
    """detectron2 ``RotatedBoxes.scale`` under anisotropic image rescale."""
    cx, cy, w, h, a = jnp.moveaxis(boxes, -1, 0)
    theta = a * jnp.pi / 180.0
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx = cx * scale_x
    cy = cy * scale_y
    w = w * jnp.sqrt((scale_x * c) ** 2 + (scale_y * s) ** 2)
    h = h * jnp.sqrt((scale_x * s) ** 2 + (scale_y * c) ** 2)
    a = jnp.arctan2(scale_x * s, scale_y * c) * 180.0 / jnp.pi
    return jnp.stack([cx, cy, w, h, a], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    return (boxes[..., 2] > threshold) & (boxes[..., 3] > threshold)


def get_deltas(
    src: jnp.ndarray, target: jnp.ndarray, weights: Sequence[float]
) -> jnp.ndarray:
    """Rotated box2box encode (detectron2 ``Box2BoxTransformRotated``)."""
    wx, wy, ww, wh, wa = weights
    sx, sy, sw, sh, sa = jnp.moveaxis(src, -1, 0)
    tx, ty, tw, th, ta = jnp.moveaxis(target, -1, 0)
    dx = wx * (tx - sx) / sw
    dy = wy * (ty - sy) / sh
    dw = ww * jnp.log(tw / sw)
    dh = wh * jnp.log(th / sh)
    da = normalize_angle(ta - sa) * wa * jnp.pi / 180.0
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def apply_deltas(
    deltas: jnp.ndarray, boxes: jnp.ndarray, weights: Sequence[float]
) -> jnp.ndarray:
    """Rotated box2box decode (detectron2 ``Box2BoxTransformRotated``)."""
    wx, wy, ww, wh, wa = weights
    sx, sy, sw, sh, sa = jnp.moveaxis(boxes, -1, 0)
    dx, dy, dw, dh, da = jnp.moveaxis(deltas, -1, 0)
    dw = jnp.minimum(dw / ww, SCALE_CLAMP)
    dh = jnp.minimum(dh / wh, SCALE_CLAMP)
    px = dx / wx * sw + sx
    py = dy / wy * sh + sy
    pw = jnp.exp(dw) * sw
    ph = jnp.exp(dh) * sh
    pa = normalize_angle(da * 180.0 / jnp.pi / wa + sa)
    return jnp.stack([px, py, pw, ph, pa], axis=-1)


def overwrite_orientations_on_boxes(
    boxes: jnp.ndarray, orientations: jnp.ndarray
) -> jnp.ndarray:
    """Snap box angle to the predicted cardinal orientation.

    Matches reference ``glass/utils/rotated_box_utils.py:4-35``: if the delta
    between the box's own cardinal bucket and the predicted orientation is
    90/270, swap w/h; shift angle by 90 * delta and renormalize.
    """
    cx, cy, w, h, a = jnp.moveaxis(boxes, -1, 0)
    box_orient = (jnp.round(a / 90.0).astype(jnp.int32)) % 4
    delta = (box_orient - orientations.astype(jnp.int32)) % 4
    swap = (delta == 1) | (delta == 3)
    new_w = jnp.where(swap, h, w)
    new_h = jnp.where(swap, w, h)
    new_a = normalize_angle(a + 90.0 * delta.astype(a.dtype))
    return jnp.stack([cx, cy, new_w, new_h, new_a], axis=-1)


def inflate_boxes(boxes: jnp.ndarray, ratio: float, axis: str = "both") -> jnp.ndarray:
    """Inflate w/h by ``ratio`` (reference ``post_processor_academic.py:37-62``)."""
    cx, cy, w, h, a = jnp.moveaxis(boxes, -1, 0)
    if axis in ("both", "horizontal"):
        w = w + ratio * w
    if axis in ("both", "vertical"):
        h = h + ratio * h
    return jnp.stack([cx, cy, w, h, a], axis=-1)
