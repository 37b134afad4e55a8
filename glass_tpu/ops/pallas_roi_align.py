"""Pallas RoIAlignRotated: DMA-tiled pooling for bounded-extent rois.

The XLA gather formulation of rotated RoIAlign (roi_align_rotated.py) is
latency-bound on TPU: row gathers lower to per-row dynamic slices.  This
kernel takes the TPU-native route instead:

* grid over rois; the per-roi AABB corner is scalar-prefetched,
* ONE async DMA copies the roi's (clamped) AABB feature region HBM->VMEM
  as a (TH, TW, C) tile — lanes on C, so every bilinear tap is a cheap
  dynamically-indexed (C,) vector load,
* the sampling loop runs over the roi's ph*pw*g*g sample points inside the
  kernel with detectron2's exact sampling convention (aligned offsets,
  adaptive-capped grid, outside-zero boundary rule).

Correctness domain: rois whose (rotated) AABB fits the static tile.  FPN
level assignment bounds box/mask pooler rois to ~< 32 feature units, so
``tile=(48, 48)`` covers them including rotation; callers with unbounded
rois (the recognizer/crop poolers) keep the XLA path until their dedicated
kernels land.  Sample coordinates are clamped to the tile, so oversized
rois degrade to edge-replication rather than corruption.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    corners_ref,  # scalar prefetch: (R, 2) int32 tile corners (y0, x0)
    rois_ref,     # scalar prefetch: (R, 8) f32 roi params (SMEM)
    feat_ref,     # (H, W, C) in ANY/HBM
    out_ref,      # (1, ph*pw, C) block for this roi
    tile_ref,     # scratch (TH, TW, C)
    sem,          # DMA semaphore
    *,
    pooled_h: int,
    pooled_w: int,
    grid_n: int,
    tile_h: int,
    tile_w: int,
    map_h: int,
    map_w: int,
):
    r = pl.program_id(0)
    y0 = corners_ref[r, 0]
    x0 = corners_ref[r, 1]
    # The host aligns x0 to the sublane tiling; Mosaic needs the proof hint.
    x0_aligned = pl.multiple_of(x0, 8)

    dma = pltpu.make_async_copy(
        feat_ref.at[pl.ds(y0, tile_h), pl.ds(x0_aligned, tile_w), :], tile_ref, sem
    )
    dma.start()

    cx = rois_ref[r, 0]
    cy = rois_ref[r, 1]
    rw = rois_ref[r, 2]
    rh = rois_ref[r, 3]
    cos_t = rois_ref[r, 4]
    sin_t = rois_ref[r, 5]
    g_h = rois_ref[r, 6]
    g_w = rois_ref[r, 7]

    bin_h = rh / pooled_h
    bin_w = rw / pooled_w
    inv_count = 1.0 / (g_h * g_w)

    dma.wait()

    tile_hf = jnp.float32(tile_h)
    tile_wf = jnp.float32(tile_w)

    def sample_one(ph, pw, iy, ix, acc):
        yy = -rh * 0.5 + ph * bin_h + (iy + 0.5) * bin_h / g_h
        xx = -rw * 0.5 + pw * bin_w + (ix + 0.5) * bin_w / g_w
        y_map = yy * cos_t - xx * sin_t + cy
        x_map = yy * sin_t + xx * cos_t + cx
        # detectron2 boundary rule against the TRUE map extent (indices are
        # computed in map coordinates, then shifted into the tile).
        inside = (
            (y_map >= -1.0) & (y_map <= map_h) & (x_map >= -1.0) & (x_map <= map_w)
        )
        y = jnp.clip(y_map, 0.0, None)
        x = jnp.clip(x_map, 0.0, None)
        yl = jnp.minimum(jnp.floor(y), map_h - 1)
        xl = jnp.minimum(jnp.floor(x), map_w - 1)
        y = jnp.where(yl >= map_h - 1, yl, y)
        x = jnp.where(xl >= map_w - 1, xl, x)
        yi = jnp.clip(yl.astype(jnp.int32) - y0, 0, tile_h - 1)
        xi = jnp.clip(xl.astype(jnp.int32) - x0, 0, tile_w - 1)
        yi1 = jnp.minimum(
            jnp.minimum(yl.astype(jnp.int32) + 1, map_h - 1) - y0, tile_h - 1
        )
        xi1 = jnp.minimum(
            jnp.minimum(xl.astype(jnp.int32) + 1, map_w - 1) - x0, tile_w - 1
        )
        yi1 = jnp.clip(yi1, 0, tile_h - 1)
        xi1 = jnp.clip(xi1, 0, tile_w - 1)
        ly = y - yl
        lx = x - xl
        v00 = tile_ref[yi, xi, :]
        v01 = tile_ref[yi, xi1, :]
        v10 = tile_ref[yi1, xi, :]
        v11 = tile_ref[yi1, xi1, :]
        val = (
            v00 * ((1 - ly) * (1 - lx))
            + v01 * ((1 - ly) * lx)
            + v10 * (ly * (1 - lx))
            + v11 * (ly * lx)
        )
        grid_ok = (iy < g_h) & (ix < g_w)
        w = jnp.where(inside & grid_ok, inv_count, 0.0)
        return acc + val * w

    def bin_body(b, _):
        ph = (b // pooled_w).astype(jnp.float32)
        pw = (b % pooled_w).astype(jnp.float32)

        def grid_body(s, acc):
            iy = (s // grid_n).astype(jnp.float32)
            ix = (s % grid_n).astype(jnp.float32)
            return sample_one(ph, pw, iy, ix, acc)

        acc = jax.lax.fori_loop(
            0,
            grid_n * grid_n,
            grid_body,
            jnp.zeros((tile_ref.shape[-1],), jnp.float32),
        )
        out_ref[0, b, :] = acc
        return _

    jax.lax.fori_loop(0, pooled_h * pooled_w, bin_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio",
                     "max_sampling_ratio", "tile"),
)
def roi_align_rotated_pallas(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: tuple,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    max_sampling_ratio: int = 4,
    tile: tuple = (48, 56),
) -> jnp.ndarray:
    """Drop-in for ``roi_align_rotated`` on bounded-extent rois.

    features: (H, W, C); rois: (R, 5) XYWHA. Returns (R, ph, pw, C).
    """
    pooled_h, pooled_w = output_size
    tile_h, tile_w = tile
    height, width, channels = features.shape
    r = rois.shape[0]
    rois = rois.astype(jnp.float32)
    grid_n = sampling_ratio if sampling_ratio > 0 else max_sampling_ratio

    cx = rois[:, 0] * spatial_scale - 0.5
    cy = rois[:, 1] * spatial_scale - 0.5
    rw = rois[:, 2] * spatial_scale
    rh = rois[:, 3] * spatial_scale
    theta = rois[:, 4] * jnp.pi / 180.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    if sampling_ratio > 0:
        g_h = jnp.full_like(rh, sampling_ratio)
        g_w = jnp.full_like(rw, sampling_ratio)
    else:
        g_h = jnp.clip(jnp.ceil(rh / pooled_h), 1, grid_n)
        g_w = jnp.clip(jnp.ceil(rw / pooled_w), 1, grid_n)

    # AABB corner, clamped so the static tile stays in bounds.  The W axis
    # is sublane-tiled (8) in the HBM layout, so the DMA slice start on it
    # must be 8-aligned; tile_w carries +8 slack to keep coverage.
    half_h = (jnp.abs(cos_t) * rh + jnp.abs(sin_t) * rw) * 0.5
    half_w = (jnp.abs(sin_t) * rh + jnp.abs(cos_t) * rw) * 0.5
    y0 = jnp.floor(cy - half_h) - 1.0
    x0 = jnp.floor(cx - half_w) - 1.0
    y0 = jnp.clip(y0, 0.0, max(height - tile_h, 0)).astype(jnp.int32)
    x0 = jnp.clip(x0, 0.0, max(width - tile_w, 0)).astype(jnp.int32)
    x0 = (x0 // 8) * 8
    corners = jnp.stack([y0, x0], axis=1)

    roi_params = jnp.stack([cx, cy, rw, rh, cos_t, sin_t, g_h, g_w], axis=1)

    map_h, map_w = height, width  # true extent for the boundary rule
    if height < tile_h or width < tile_w:
        pad_h = max(tile_h - height, 0)
        pad_w = max(tile_w - width, 0)
        features = jnp.pad(features, ((0, pad_h), (0, pad_w), (0, 0)))

    kernel = functools.partial(
        _kernel,
        pooled_h=pooled_h,
        pooled_w=pooled_w,
        grid_n=grid_n,
        tile_h=tile_h,
        tile_w=tile_w,
        map_h=map_h,
        map_w=map_w,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(r,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # features stay in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, pooled_h * pooled_w, channels), lambda i, c, p: (i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((tile_h, tile_w, channels), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r, pooled_h * pooled_w, channels), jnp.float32),
        interpret=(jax.default_backend() != "tpu"),
    )(corners, roi_params, features.astype(jnp.float32))
    return out.reshape(r, pooled_h, pooled_w, channels)
