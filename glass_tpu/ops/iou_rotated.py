"""Pairwise rotated-box IoU / IoA on TPU.

Replaces detectron2's C++/CUDA ``box_iou_rotated`` kernel (used from
``glass/structures/boxes.py:33``, proposal matching in
``recognizers_hybrid_head.py:252`` and the rotated NMS family).

The rectangle-intersection area uses the same construction as the reference
dependency's CUDA kernel, but expressed as dense vectorized math with NO
sequential clipping loop — the shape a TPU VPU wants:

1. all 16 edge-pair intersection points (batched 2x2 solves),
2. the 8 vertices of each rectangle contained in the other (half-plane
   tests),
3. the <= 24 candidate points sorted by angle around their centroid
   (a single argsort) and integrated with a masked shoelace.

Everything vmaps over box pairs, so an (M, N) IoU matrix is one fused
elementwise program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_to_polygons

_EPS = 1e-8


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _pair_intersection_area(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quadrilaterals p, q: (4, 2) each.

    Vertices must be ordered so the interior is on the positive-cross side
    of each directed edge (the order ``boxes_to_polygons`` emits).
    """
    pn = jnp.roll(p, -1, axis=0)
    qn = jnp.roll(q, -1, axis=0)
    dp = pn - p  # (4, 2) edge vectors of p
    dq = qn - q

    # --- 16 edge-edge intersections --------------------------------------
    # p_i + t * dp_i == q_j + u * dq_j
    px, py = p[:, 0][:, None], p[:, 1][:, None]       # (4, 1)
    qx, qy = q[:, 0][None, :], q[:, 1][None, :]       # (1, 4)
    dpx, dpy = dp[:, 0][:, None], dp[:, 1][:, None]
    dqx, dqy = dq[:, 0][None, :], dq[:, 1][None, :]

    rx, ry = qx - px, qy - py                          # (4, 4)
    denom = _cross(dpx, dpy, dqx, dqy)                 # (4, 4)
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    t = _cross(rx, ry, dqx, dqy) / safe
    u = _cross(rx, ry, dpx, dpy) / safe
    inter_ok = (
        (jnp.abs(denom) >= _EPS)
        & (t >= -1e-6) & (t <= 1 + 1e-6)
        & (u >= -1e-6) & (u <= 1 + 1e-6)
    )
    ix = px + t * dpx
    iy = py + t * dpy
    inter_pts = jnp.stack([ix.reshape(-1), iy.reshape(-1)], axis=-1)  # (16, 2)
    inter_valid = inter_ok.reshape(-1)

    # --- vertices of one rect inside the other ---------------------------
    def contains(poly, poly_next, pts):
        # interior on positive side of each directed edge
        ex = (poly_next - poly)[:, 0][None, :]
        ey = (poly_next - poly)[:, 1][None, :]
        wx = pts[:, 0][:, None] - poly[:, 0][None, :]
        wy = pts[:, 1][:, None] - poly[:, 1][None, :]
        side = ex * wy - ey * wx
        return jnp.all(side >= -1e-6, axis=1)

    p_in_q = contains(q, qn, p)  # (4,)
    q_in_p = contains(p, pn, q)

    pts = jnp.concatenate([inter_pts, p, q], axis=0)          # (24, 2)
    valid = jnp.concatenate([inter_valid, p_in_q, q_in_p])    # (24,)

    n = jnp.sum(valid.astype(jnp.int32))

    # --- order by angle around the centroid, masked shoelace -------------
    denom_n = jnp.maximum(n, 1).astype(pts.dtype)
    centroid = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / denom_n
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = jnp.where(valid, ang, 1e9)  # invalid points sort last
    order = jnp.argsort(ang)
    sp = pts[order]

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    x, y = sp[:, 0], sp[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(idx < n, cross, 0.0)))
    return jnp.where(n >= 3, area, 0.0)


@jax.jit
def pairwise_intersection_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,5) x (N,5) XYWHA -> (M,N) intersection areas."""
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
    return jnp.clip(jnp.where(valid, iou, 0.0), 0.0, 1.0)


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
