"""Pairwise rotated-box IoU / IoA on TPU via convex polygon clipping.

The reference relies on detectron2's C++/CUDA ``box_iou_rotated`` kernel
(used from ``glass/structures/boxes.py:33``, proposal matching in
``recognizers_hybrid_head.py:252`` and the rotated NMS family).  Here the
Sutherland–Hodgman clip of one rotated rectangle against the other is
expressed as a fixed-trip-count ``fori_loop`` over at most 8 polygon
vertices, vmapped over box pairs, which XLA vectorizes across the VPU lanes.

All buffers are static: a convex 4-gon clipped by 4 half-planes has at most
8 vertices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_to_polygons

_MAX_VERTS = 8


def _clip_by_halfplane(poly, n, a, b):
    """Clip polygon ``poly`` (kept verts: first ``n``) by the half-plane on the
    left of the directed edge a->b (cross(b-a, p-a) >= 0)."""
    ba = b - a

    def side(p):
        return ba[0] * (p[1] - a[1]) - ba[1] * (p[0] - a[0])

    out = jnp.zeros_like(poly)
    m0 = jnp.int32(0)

    def body(i, state):
        out, m = state
        valid = i < n
        cur = poly[i]
        prev = poly[jnp.where(i == 0, n - 1, i - 1)]
        s_cur = side(cur)
        s_prev = side(prev)
        cur_in = s_cur >= 0
        prev_in = s_prev >= 0
        # Intersection of segment prev->cur with the clip line.
        denom = s_prev - s_cur
        t = s_prev / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        inter = prev + t * (cur - prev)
        # Emit intersection point when the segment crosses the line.
        emit_inter = valid & (cur_in != prev_in)
        out = jnp.where(emit_inter, out.at[m].set(inter), out)
        m = m + emit_inter.astype(jnp.int32)
        # Emit the current point when inside.
        emit_cur = valid & cur_in
        out = jnp.where(emit_cur, out.at[m].set(cur), out)
        m = m + emit_cur.astype(jnp.int32)
        return out, m

    out, m = jax.lax.fori_loop(0, poly.shape[0], body, (out, m0))
    return out, m


def _polygon_area(poly, n):
    """Shoelace area of the first ``n`` vertices (counter-clockwise > 0)."""
    idx = jnp.arange(poly.shape[0])
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    x, y = poly[:, 0], poly[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    cross = jnp.where(idx < n, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def _pair_intersection_area(poly1, poly2):
    """Intersection area of two convex quadrilaterals (4, 2) each."""
    poly = jnp.zeros((_MAX_VERTS, 2), poly1.dtype).at[:4].set(poly1)
    n = jnp.int32(4)

    def clip_edge(i, state):
        poly, n = state
        a = poly2[i]
        b = poly2[(i + 1) % 4]
        return _clip_by_halfplane(poly, n, a, b)

    poly, n = jax.lax.fori_loop(0, 4, clip_edge, (poly, n))
    return jnp.where(n >= 3, _polygon_area(poly, n), 0.0)


@jax.jit
def pairwise_intersection_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,5) x (N,5) XYWHA -> (M,N) intersection areas."""
    # boxes_to_polygons emits vertices so that the interior lies on the
    # positive-cross side of each directed edge, matching _clip_by_halfplane.
    p1 = boxes_to_polygons(boxes1.astype(jnp.float32))
    p2 = boxes_to_polygons(boxes2.astype(jnp.float32))
    fn = jax.vmap(jax.vmap(_pair_intersection_area, in_axes=(None, 0)), in_axes=(0, None))
    return fn(p1, p2)


@jax.jit
def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,5) x (N,5) XYWHA -> (M,N) IoU, detectron2-compatible semantics."""
    inter = pairwise_intersection_rotated(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = a1 + a2 - inter
    iou = jnp.where(union > 1e-12, inter / union, 0.0)
    # Degenerate (zero-area) boxes have IoU 0 with everything.
    valid = (a1 > 1e-14) & (a2 > 1e-14)
    return jnp.where(valid, iou, 0.0)


@jax.jit
def pairwise_ioa_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over the *minimal* area of the two boxes.

    Reproduces reference ``glass/structures/boxes.py:23-48``, which derives the
    intersection from IoU algebraically: ``inter = iou * (a1 + a2) / (1 + iou)``.
    """
    iou = pairwise_iou_rotated(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    inter = (a1 + a2) * iou / (1.0 + iou)
    min_area = jnp.minimum(a1, a2)
    return jnp.where(min_area > 1e-12, inter / min_area, 0.0)
