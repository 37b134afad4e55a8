"""Minimum-area enclosing rotated rectangle, on device.

The reference computes this with ``cv2.minAreaRect`` in a per-box Python
loop on the CPU (``post_processor_rotated_boxes.py:253-286``) — the hottest
part of its post-processing fixpoint.  Here it is a vectorized rotating-
calipers pass over fixed-size point sets: convex hull via Andrew's monotone
chain with static buffers, then the minimal rectangle over hull-edge
directions, all vmappable over N polygons.

Also implements the reference's orientation-consistent width/height/angle
disambiguation (``polygons_to_rotated_boxes``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import normalize_angle


def _convex_hull(points: jnp.ndarray, valid: jnp.ndarray):
    """Convex hull of up to P points with a static output buffer.

    Args:
        points: (P, 2).
        valid: (P,) bool mask of real points.

    Returns:
        hull: (2P, 2) buffer, first ``m`` entries are hull vertices (CCW in
            y-down image coordinates), rest repeat the last vertex.
        m: scalar int count.
    """
    p = points.shape[0]
    big = 1e30
    # Sort lexicographically by (x, y); invalid points pushed to the end.
    x_key = jnp.where(valid, points[:, 0], big)
    y_key = jnp.where(valid, points[:, 1], big)
    order = jnp.lexsort((y_key, x_key))
    pts = points[order]
    n = jnp.sum(valid.astype(jnp.int32))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(pts_seq):
        """One monotone-chain half over the (sorted) sequence."""
        buf = jnp.zeros((p, 2), points.dtype)
        k = jnp.int32(0)

        def body(i, state):
            buf, k = state
            pt = pts_seq[i]
            use = i < n

            def pop_cond(state):
                _, kk = state
                return (kk >= 2) & (cross(buf[kk - 2], buf[kk - 1], pt) <= 0)

            def pop_body(state):
                bb, kk = state
                return bb, kk - 1

            def do_push(state):
                bb, kk = state
                bb, kk = jax.lax.while_loop(pop_cond, pop_body, (bb, kk))
                return bb.at[kk].set(pt), kk + 1

            buf, k = jax.lax.cond(use, do_push, lambda s: s, (buf, k))
            return buf, k

        return jax.lax.fori_loop(0, p, body, (buf, k))

    lower_buf, lower_k = half(pts)
    upper_buf, upper_k = half(pts[::-1])

    # Concatenate lower[:-1] + upper[:-1].
    hull = jnp.zeros((2 * p, 2), points.dtype)
    m_lower = jnp.maximum(lower_k - 1, 0)
    m_upper = jnp.maximum(upper_k - 1, 0)
    idx = jnp.arange(2 * p)
    lower_take = jnp.clip(idx, 0, p - 1)
    upper_take = jnp.clip(idx - m_lower, 0, p - 1)
    from_lower = idx < m_lower
    vals = jnp.where(
        from_lower[:, None], lower_buf[lower_take], upper_buf[upper_take]
    )
    m = m_lower + m_upper
    # Degenerate: fewer than 3 points — fall back to the raw points.
    m = jnp.maximum(m, jnp.minimum(n, 2))
    in_range = idx < m
    last = vals[jnp.maximum(m - 1, 0)]
    hull = jnp.where(in_range[:, None], vals, last[None, :])
    return hull, m


def min_area_rect(points: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Minimal-area enclosing rotated rectangle of a 2D point set.

    Args:
        points: (P, 2) float points.
        valid: optional (P,) mask.

    Returns:
        (cx, cy, w, h, angle_deg): rectangle with ``angle`` being the CCW
        rotation (image coords) of the edge taken as "width".
    """
    if valid is None:
        valid = jnp.ones(points.shape[0], bool)
    hull, m = _convex_hull(points, valid)
    hp = hull.shape[0]
    idx = jnp.arange(hp)
    nxt = jnp.where(idx + 1 >= m, 0, idx + 1)
    edges = hull[nxt] - hull  # (2P, 2)
    edge_len = jnp.sqrt(jnp.sum(edges**2, axis=-1))
    edge_valid = (idx < m) & (edge_len > 1e-9)
    dirs = edges / jnp.maximum(edge_len, 1e-9)[:, None]  # (2P, 2)

    # Project all hull points onto each candidate edge frame.
    ux, uy = dirs[:, 0], dirs[:, 1]
    px, py = hull[:, 0], hull[:, 1]
    point_valid = idx < m
    proj_u = ux[:, None] * px[None, :] + uy[:, None] * py[None, :]  # (E, P)
    proj_v = -uy[:, None] * px[None, :] + ux[:, None] * py[None, :]

    big = 1e30
    pv = point_valid[None, :]
    u_min = jnp.min(jnp.where(pv, proj_u, big), axis=1)
    u_max = jnp.max(jnp.where(pv, proj_u, -big), axis=1)
    v_min = jnp.min(jnp.where(pv, proj_v, big), axis=1)
    v_max = jnp.max(jnp.where(pv, proj_v, -big), axis=1)
    areas = (u_max - u_min) * (v_max - v_min)
    areas = jnp.where(edge_valid, areas, big)
    best = jnp.argmin(areas)

    w = u_max[best] - u_min[best]
    h = v_max[best] - v_min[best]
    cu = (u_max[best] + u_min[best]) / 2.0
    cv = (v_max[best] + v_min[best]) / 2.0
    bu = dirs[best]
    cx = cu * bu[0] - cv * bu[1]
    cy = cu * bu[1] + cv * bu[0]
    # Angle of the "width" edge.  In image coordinates (y down) the XYWHA
    # convention measures CCW angles, i.e. -atan2(dy, dx) in array terms.
    angle = -jnp.arctan2(bu[1], bu[0]) * 180.0 / jnp.pi
    return cx, cy, w, h, angle


def polygons_to_rotated_boxes(
    polygons: jnp.ndarray,
    orientations: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fit min-area rotated boxes to polygons, disambiguated by orientation.

    Mirrors reference ``post_processor_rotated_boxes.py:253-286``: rotate the
    fitted rectangle's (w, h, angle) so the final angle is within 45 degrees
    of the requested orientation angle.

    Args:
        polygons: (N, P, 2) point sets.
        orientations: (N,) desired angles in degrees.
        valid: optional (N, P) point masks.
    """
    if valid is None:
        valid = jnp.ones(polygons.shape[:2], bool)

    def one(poly, mask, orient):
        cx, cy, w, h, angle = min_area_rect(poly, mask)
        diff = normalize_angle(orient - angle)
        # Four quadrant cases from the reference implementation.
        case90 = (diff > 45) & (diff <= 135)
        case_90 = (diff > -135) & (diff <= -45)
        case180 = (diff > 135) | (diff <= -135)
        swap = case90 | case_90
        out_w = jnp.where(swap, h, w)
        out_h = jnp.where(swap, w, h)
        out_angle = angle + 90.0 * case90 - 90.0 * case_90 + 180.0 * case180
        return jnp.stack([cx, cy, out_w, out_h, normalize_angle(out_angle)])

    return jax.vmap(one)(polygons, valid, orientations)
