"""Rotated RoIAlign for TPU.

Replaces detectron2's ``ROIAlignRotated`` CUDA/C++ op, which the reference
uses four ways per forward pass (box pooler 7x7, mask pooler 14x14,
recognizer pooler 8x32 on fused P2/P3, and a 128x128 crop pooler on the raw
image — ``recognizers_hybrid_head.py:200,357,464,495``).

Semantics follow the detectron2 kernel exactly:

* rois are (cx, cy, w, h, angle_deg), scaled by ``spatial_scale`` and shifted
  by the aligned half-pixel offset,
* the per-bin sampling grid is ``sampling_ratio`` when > 0, else
  ``ceil(roi_extent / pooled_extent)``; the dynamic case is realised as a
  static ``max_sampling_ratio`` grid with per-roi masking so shapes stay
  fixed under jit,
* bilinear taps outside ``[-1, H]``/``[-1, W]`` contribute zero; coordinates
  are clamped to the array as in the reference kernel.

Differentiable end-to-end: the gather formulation autodiffs to scatter-adds,
giving the custom backward the reference implements by hand in CUDA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(flat_img, y, x, height, width, channels):
    """Bilinear sample of flattened (H*W, C) image at float coords (y, x)."""
    outside = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    y_low = jnp.minimum(y_low, height - 1)
    x_low = jnp.minimum(x_low, width - 1)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)
    y = jnp.where(y_low >= height - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= width - 1, x_low.astype(x.dtype), x)

    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    def take(yy, xx):
        return flat_img[yy * width + xx]

    v = (
        take(y_low, x_low) * (hy * hx)[..., None]
        + take(y_low, x_high) * (hy * lx)[..., None]
        + take(y_high, x_low) * (ly * hx)[..., None]
        + take(y_high, x_high) * (ly * lx)[..., None]
    )
    return jnp.where(outside[..., None], 0.0, v)


@partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "max_sampling_ratio",
        "aligned",
    ),
)
def roi_align_rotated(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: tuple,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    max_sampling_ratio: int = 4,
    aligned: bool = True,
) -> jnp.ndarray:
    """Pool rotated regions from a feature map.

    Args:
        features: (H, W, C) feature map.
        rois: (R, 5) XYWHA boxes in input-image coordinates.
        output_size: (pooled_h, pooled_w).
        spatial_scale: feature stride reciprocal.
        sampling_ratio: taps per bin side; 0 means adaptive
            (``ceil(roi_extent / pooled_extent)``, capped at
            ``max_sampling_ratio`` to keep shapes static).
        aligned: use the half-pixel offset (detectron2 ``ROIAlignRotated``
            is always aligned).

    Returns:
        (R, pooled_h, pooled_w, C) pooled features.
    """
    pooled_h, pooled_w = output_size
    height, width = features.shape[0], features.shape[1]
    channels = features.shape[2]
    flat = features.reshape(height * width, channels)
    offset = 0.5 if aligned else 0.0

    grid = sampling_ratio if sampling_ratio > 0 else max_sampling_ratio

    def pool_one(roi):
        cx = roi[0] * spatial_scale - offset
        cy = roi[1] * spatial_scale - offset
        rw = roi[2] * spatial_scale
        rh = roi[3] * spatial_scale
        theta = roi[4] * jnp.pi / 180.0
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

        bin_h = rh / pooled_h
        bin_w = rw / pooled_w
        if sampling_ratio > 0:
            g_h = jnp.int32(sampling_ratio)
            g_w = jnp.int32(sampling_ratio)
        else:
            g_h = jnp.clip(jnp.ceil(rh / pooled_h), 1, grid).astype(jnp.int32)
            g_w = jnp.clip(jnp.ceil(rw / pooled_w), 1, grid).astype(jnp.int32)

        ph = jnp.arange(pooled_h, dtype=features.dtype)
        pw = jnp.arange(pooled_w, dtype=features.dtype)
        iy = jnp.arange(grid, dtype=features.dtype)
        ix = jnp.arange(grid, dtype=features.dtype)

        # Sample coordinates in the roi frame, relative to the roi center.
        yy = (
            -rh / 2.0
            + ph[:, None] * bin_h
            + (iy[None, :] + 0.5) * bin_h / g_h.astype(features.dtype)
        )  # (pooled_h, grid)
        xx = (
            -rw / 2.0
            + pw[:, None] * bin_w
            + (ix[None, :] + 0.5) * bin_w / g_w.astype(features.dtype)
        )  # (pooled_w, grid)

        # Rotate into image frame (detectron2 kernel convention).
        y = (
            yy[:, None, :, None] * cos_t
            - xx[None, :, None, :] * sin_t
            + cy
        )  # (ph, pw, gh, gw)
        x = (
            yy[:, None, :, None] * sin_t
            + xx[None, :, None, :] * cos_t
            + cx
        )

        vals = _bilinear_gather(flat, y, x, height, width, channels)
        mask = (
            (jnp.arange(grid) < g_h)[None, None, :, None]
            & (jnp.arange(grid) < g_w)[None, None, None, :]
        )
        vals = jnp.where(mask[..., None], vals, 0.0)
        count = (g_h * g_w).astype(features.dtype)
        return jnp.sum(vals, axis=(2, 3)) / count

    return jax.vmap(pool_one)(rois.astype(features.dtype))


def roi_align_rotated_batched(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: tuple,
    **kwargs,
) -> jnp.ndarray:
    """vmap over a leading image batch: features (B,H,W,C), rois (B,R,5)."""
    fn = lambda f, r: roi_align_rotated(f, r, output_size, **kwargs)
    return jax.vmap(fn)(features, rois)


def assign_boxes_to_levels(
    rois: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level assignment (detectron2 ``ROIPooler`` heuristic)."""
    areas = jnp.maximum(rois[..., 2] * rois[..., 3], 1e-12)
    sqrt_area = jnp.sqrt(areas)
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def multilevel_roi_align_rotated(
    features: list,
    rois: jnp.ndarray,
    output_size: tuple,
    strides: list,
    sampling_ratio: int = 0,
    max_sampling_ratio: int = 4,
) -> jnp.ndarray:
    """detectron2 multi-level ``ROIPooler`` with ``ROIAlignRotated``.

    Every roi is pooled from every level and the per-roi level assignment
    selects the result — an extra constant factor of L that keeps shapes
    static and is cheap for the small L=4 pyramid this model uses.

    Args:
        features: list of (H_l, W_l, C) maps ordered by level.
        rois: (R, 5).
        strides: list of integer strides per level.
    """
    min_level = int(strides[0]).bit_length() - 1  # stride 4 -> level 2
    levels = assign_boxes_to_levels(rois, min_level, min_level + len(features) - 1)
    pooled = []
    for f, s in zip(features, strides):
        pooled.append(
            roi_align_rotated(
                f,
                rois,
                output_size,
                spatial_scale=1.0 / s,
                sampling_ratio=sampling_ratio,
                max_sampling_ratio=max_sampling_ratio,
            )
        )
    stacked = jnp.stack(pooled, axis=0)  # (L, R, ph, pw, C)
    return jnp.take_along_axis(
        stacked, levels[None, :, None, None, None], axis=0
    )[0]
