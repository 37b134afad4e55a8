"""Pairwise rotated-box IoU / IoA on TPU.

Replaces detectron2's C++/CUDA ``box_iou_rotated`` kernel (used from
``glass/structures/boxes.py:33``, proposal matching in
``recognizers_hybrid_head.py:252`` and the rotated NMS family).

The intersection area is computed WITHOUT collecting or ordering the
intersection polygon: by Green's theorem, ``area(P ∩ Q) = ∮ x dy`` over the
intersection boundary, which decomposes into the parts of P's edges inside
Q plus the parts of Q's edges inside P.  Each part is a parametric
sub-segment found by clipping the edge's parameter interval against the
other rectangle's four half-planes (a slab test), and its ``∫ x dy``
contribution is a closed form in the interval endpoints.  That is ~40 flops
per edge — no candidate sort, no transcendentals — laid out with the pair
axes minor-most for the (8, 128) vector tiles.

Peak memory is bounded by chunking the first box axis through a static loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_to_polygons

_CHUNK = 128


def _edges_inside_integral(p, pn, q, qn, eps=0.0, scale=1.0):
    """Sum of ``∮ x dy`` over the parts of P's edges inside Q.

    ``eps`` is a tolerance *relative to the pair's geometric scale*: the
    band half-width in pixels is ``eps * scale``, applied to cross products
    that carry px·edge-length units (hence the ``qlen`` factor).  ``eps >
    0`` makes the inside test strict — used for the second sum so boundary
    segments shared by both rectangles (identical/abutting boxes) are
    counted exactly once, at any box scale, while staying just above the
    recentered-f32 cross-product noise floor (which is also ∝ scale).

    Args:
        p, pn: (4, M, 1, 2)-style split coords — here passed as tuples of
            (x, y) arrays with shapes broadcastable to (4, M, N).
        q, qn: the clipping rectangle's edges, (4, 1, N)-broadcastable.
        scale: (M, N)-broadcastable per-pair size (max vertex radius).

    All polygons must have the interior on the positive-cross side of each
    directed edge (the ``boxes_to_polygons`` order).
    """
    px, py = p
    pnx, pny = pn
    qx, qy = q
    qnx, qny = qn

    dx = pnx - px  # (4p, M, 1)
    dy = pny - py

    # Segment point: s(t) = p + t*d.  Inside condition for clip edge j:
    # cross(qd_j, s(t) - q_j) >= 0  ->  c0 + t*c1 >= 0.
    qdx = (qnx - qx)[None]  # (1, 4q, 1, N)
    qdy = (qny - qy)[None]
    qlen = jnp.sqrt(qdx * qdx + qdy * qdy)
    c0 = (
        qdx * (py[:, None] - qy[None])
        - qdy * (px[:, None] - qx[None])
        - (eps * qlen) * scale
    )
    c1 = qdx * dy[:, None] - qdy * dx[:, None]  # (4p, 4q, M, N)

    # Parameter interval [t_lo, t_hi] of the inside part.
    big = 1e30
    safe_c1 = jnp.where(jnp.abs(c1) < 1e-12, 1e-12, c1)
    t_cross = -c0 / safe_c1
    # c1 > 0: entering (t >= t_cross); c1 < 0: leaving (t <= t_cross);
    # c1 ~ 0: inside iff c0 >= 0 (whole interval or nothing).
    degenerate = jnp.abs(c1) < 1e-12
    lo_j = jnp.where(degenerate, jnp.where(c0 >= 0, -big, big), jnp.where(c1 > 0, t_cross, -big))
    hi_j = jnp.where(degenerate, jnp.where(c0 >= 0, big, -big), jnp.where(c1 < 0, t_cross, big))
    t_lo = jnp.clip(jnp.max(lo_j, axis=1), 0.0, 1.0)  # (4p, M, N)
    t_hi = jnp.clip(jnp.min(hi_j, axis=1), 0.0, 1.0)
    t_hi = jnp.maximum(t_hi, t_lo)

    # ∫_{t_lo}^{t_hi} (px + t dx) dy dt = dy * (px*(t_hi-t_lo) + dx*(t_hi^2-t_lo^2)/2)
    seg = dy * (px * (t_hi - t_lo) + dx * (t_hi**2 - t_lo**2) * 0.5)
    return jnp.sum(seg, axis=0)  # (M, N)


def _intersection_chunk(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Intersection areas for polygon chunks: (M,4,2) x (N,4,2) -> (M,N)."""
    # Point-major coordinate layouts with pair axes minor-most.
    p1x = p1[:, :, 0].T[:, :, None]  # (4, M, 1)
    p1y = p1[:, :, 1].T[:, :, None]
    p2x = p2[:, :, 0].T[:, None, :]  # (4, 1, N)
    p2y = p2[:, :, 1].T[:, None, :]
    # Recenter every pair at the midpoint of the two box centers: the cross
    # products in the slab tests cancel catastrophically in f32 at
    # image-scale coordinates, and only nearby pairs (small relative
    # coordinates) have nonzero intersections anyway.
    cx = (jnp.mean(p1x, axis=0) + jnp.mean(p2x, axis=0)) * 0.5  # (M, N)
    cy = (jnp.mean(p1y, axis=0) + jnp.mean(p2y, axis=0)) * 0.5
    p1x, p1y = p1x - cx, p1y - cy
    p2x, p2y = p2x - cx, p2y - cy
    p1nx = jnp.roll(p1x, -1, axis=0)
    p1ny = jnp.roll(p1y, -1, axis=0)
    p2nx = jnp.roll(p2x, -1, axis=0)
    p2ny = jnp.roll(p2y, -1, axis=0)

    # Boundary-tie tolerance: ±3e-5 of the pair's size (max recentered
    # vertex radius) — scale-invariant, ~10x above the recentered-f32
    # cross-product noise (∝ scale^2 * 2^-23 over edge length), and small
    # enough that the junction trimming it causes stays ≲1e-4 in IoU.
    # The first sum includes its own boundary (negative eps guards float
    # cancellation on c0 ~ 0), the second excludes it strictly, so shared
    # boundary segments are counted exactly once.
    r2_1 = jnp.max(p1x * p1x + p1y * p1y, axis=0)  # (M, N)
    r2_2 = jnp.max(p2x * p2x + p2y * p2y, axis=0)
    scale = jnp.sqrt(jnp.maximum(jnp.maximum(r2_1, r2_2), 1e-12))
    total = _edges_inside_integral(
        (p1x, p1y), (p1nx, p1ny), (p2x, p2y), (p2nx, p2ny),
        eps=-3e-5, scale=scale,
    ) + _edges_inside_integral(
        (p2x, p2y), (p2nx, p2ny), (p1x, p1y), (p1nx, p1ny),
        eps=3e-5, scale=scale,
    )
    return jnp.abs(total)


def _pairwise_intersection_impl(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    p1 = boxes_to_polygons(boxes1.astype(jnp.float32))
    p2 = boxes_to_polygons(boxes2.astype(jnp.float32))
    m = p1.shape[0]
    if m <= _CHUNK:
        return _intersection_chunk(p1, p2)
    pad = (-m) % _CHUNK
    p1p = jnp.pad(p1, ((0, pad), (0, 0), (0, 0)))
    chunks = p1p.reshape(-1, _CHUNK, 4, 2)
    out = jax.lax.map(lambda c: _intersection_chunk(c, p2), chunks)
    return out.reshape(-1, p2.shape[0])[:m]


@jax.jit
def pairwise_intersection_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,5) x (N,5) XYWHA -> (M,N) intersection areas."""
    return _pairwise_intersection_impl(boxes1, boxes2)


@jax.jit
def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(M,5) x (N,5) XYWHA -> (M,N) IoU, detectron2-compatible semantics."""
    inter = _pairwise_intersection_impl(boxes1, boxes2)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = a1 + a2 - inter
    iou = jnp.where(union > 1e-12, inter / union, 0.0)
    # Degenerate (zero-area) boxes have IoU 0 with everything.
    valid = (a1 > 1e-14) & (a2 > 1e-14)
    return jnp.clip(jnp.where(valid, iou, 0.0), 0.0, 1.0)


def pairwise_iou_rotated_rowmasked(
    boxes1: jnp.ndarray,
    valid1: jnp.ndarray,
    boxes2: jnp.ndarray,
    chunk: int = 32,
) -> jnp.ndarray:
    """IoU like :func:`pairwise_iou_rotated` with invalid rows zeroed — and,
    crucially, whole invalid row-*chunks* skipped via ``lax.cond``, so the
    cost scales with the number of valid rows (the anchor matcher's gt axis
    is padded to 256 but typically carries 10-40 real gts).

    The cond is a real branch only OUTSIDE vmap (the train step unrolls
    its batch loop); under vmap this degrades to computing both branches
    (still correct, just not faster).
    """
    from .boxes import boxes_to_polygons

    m = boxes1.shape[0]
    n = boxes2.shape[0]
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    pad = (-m) % chunk
    b1 = jnp.pad(boxes1, ((0, pad), (0, 0)))
    v1 = jnp.pad(valid1, (0, pad)).reshape(-1, chunk)
    b1 = b1.reshape(-1, chunk, 5)
    p2 = boxes_to_polygons(boxes2)
    a2 = boxes2[:, 2] * boxes2[:, 3]

    def body(_, xs):
        cb, cv = xs

        def live(_x):
            inter = _intersection_chunk(boxes_to_polygons(cb), p2)
            a1 = cb[:, 2] * cb[:, 3]
            union = a1[:, None] + a2[None, :] - inter
            iou = jnp.where(union > 1e-12, inter / union, 0.0)
            valid = (a1 > 1e-14)[:, None] & (a2 > 1e-14)[None, :]
            iou = jnp.clip(jnp.where(valid, iou, 0.0), 0.0, 1.0)
            return iou * cv[:, None]

        return None, jax.lax.cond(
            jnp.any(cv), live, lambda _x: jnp.zeros((chunk, n), jnp.float32), None
        )

    _, out = jax.lax.scan(body, None, (b1, v1))
    return out.reshape(-1, n)[:m]


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
