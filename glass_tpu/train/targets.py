"""Training-target construction on device.

The reference builds mask targets by rotating gt polygons into each
proposal's frame and rasterizing them **per instance on the CPU**
(``rotated_mask_head.py:245-322`` via pycocotools) — a device<->host
round-trip every step.  Here the same geometry runs in-graph: the 28x28
target grid points are mapped into image coordinates through the proposal's
rotated frame (the RoIAlign sampling formula) and tested against the gt
polygon with a vectorized crossing-number test.  No host transfer, no
dynamic shapes (polygons are padded to a fixed vertex count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_polygon(
    points: jnp.ndarray, polygon: jnp.ndarray, n_vertices: jnp.ndarray
) -> jnp.ndarray:
    """Crossing-number point-in-polygon test.

    Args:
        points: (..., 2) query points.
        polygon: (K, 2) padded vertex array.
        n_vertices: scalar int, number of valid vertices.

    Returns:
        (...,) bool mask.
    """
    k = polygon.shape[0]
    idx = jnp.arange(k)
    nxt = jnp.where(idx + 1 >= n_vertices, 0, idx + 1)
    v0 = polygon  # (K, 2)
    v1 = polygon[nxt]
    valid_edge = idx < n_vertices

    px = points[..., 0][..., None]  # (..., 1)
    py = points[..., 1][..., None]
    y0, y1 = v0[:, 1], v1[:, 1]
    x0, x1 = v0[:, 0], v1[:, 0]

    straddle = (y0 > py) != (y1 > py)
    # x coordinate of the edge at height py
    denom = y1 - y0
    t = (py - y0) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x_int = x0 + t * (x1 - x0)
    crossing = straddle & (px < x_int) & valid_edge
    return jnp.sum(crossing.astype(jnp.int32), axis=-1) % 2 == 1


def rasterize_polygon_in_rotated_box(
    polygon: jnp.ndarray,
    n_vertices: jnp.ndarray,
    box: jnp.ndarray,
    mask_size: int = 28,
) -> jnp.ndarray:
    """Rasterize a gt polygon (image coords) inside a rotated box frame.

    The (mask_size, mask_size) grid covers the box extent; grid centers are
    mapped into image coordinates with the ROIAlignRotated convention
    (rotation by the box angle around its center), then tested against the
    polygon.  Mirrors the reference's rotate-then-rasterize
    (``rotated_mask_head.rotate_crop_and_resize``).
    """
    cx, cy, w, h, a = box
    theta = a * jnp.pi / 180.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    s = (jnp.arange(mask_size, dtype=jnp.float32) + 0.5) / mask_size
    yy = (s - 0.5) * h  # box-frame offsets
    xx = (s - 0.5) * w
    y = yy[:, None] * cos_t - xx[None, :] * sin_t + cy
    x = yy[:, None] * sin_t + xx[None, :] * cos_t + cx
    pts = jnp.stack([x, y], axis=-1)  # (S, S, 2)
    return points_in_polygon(pts, polygon, n_vertices)


def mask_targets_for_proposals(
    polygons: jnp.ndarray,
    n_vertices: jnp.ndarray,
    matched_gt_idx: jnp.ndarray,
    proposal_boxes: jnp.ndarray,
    mask_size: int = 28,
) -> jnp.ndarray:
    """(G, K, 2) polygons + (P,) matching + (P, 5) boxes -> (P, S, S) targets."""
    sel_poly = polygons[matched_gt_idx]  # (P, K, 2)
    sel_n = n_vertices[matched_gt_idx]
    return jax.vmap(
        lambda poly, n, box: rasterize_polygon_in_rotated_box(poly, n, box, mask_size)
    )(sel_poly, sel_n, proposal_boxes)
