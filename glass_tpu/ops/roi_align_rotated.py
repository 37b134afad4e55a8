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

TPU layout: all per-sample quantities are flat ``(R, S)`` arrays with the
large sample axis minor-most (S = ph*pw*g*g), and the bilinear reads gather
along a flattened channel-major ``(C, H*W)`` image so the vector lanes run
across samples — small grids or small channel counts never get padded onto
the 128-lane axis.  Differentiable end-to-end (gather autodiffs to
scatter-add, the custom backward the reference implements by hand in CUDA).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _grid_pair(g):
    """Static grid spec (int or (grid_h, grid_w)) -> per-axis pair.

    Word-box statistics are anisotropic — e.g. at the 14x14 mask pooler a
    typical word needs d2 grid (h=1, w=2), at the 8x32 recognizer pooler
    (h=2, w=1) — so the static sampling caps accept per-axis values."""
    if isinstance(g, (tuple, list)):
        gh, gw = g
        return int(gh), int(gw)
    return int(g), int(g)


@partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "max_sampling_ratio",
        "aligned",
        "packed_taps",
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
    packed_taps: bool | None = None,
    normalize: tuple | None = None,
) -> jnp.ndarray:
    """Pool rotated regions from a feature map.

    Args:
        features: (H, W, C) feature map.
        rois: (R, 5) XYWHA boxes in input-image coordinates.
        output_size: (pooled_h, pooled_w).
        spatial_scale: feature stride reciprocal.
        sampling_ratio: taps per bin side; 0 means adaptive
            (``ceil(roi_extent / pooled_extent)``, capped at
            ``max_sampling_ratio``).
        normalize: optional ``(mean, std)`` per-channel arrays.  The pooled
            output is returned as if the *input* had been normalized first:
            ``sum_k w_k * (raw_k - mean) / std`` — the fold is exact because
            bilinear weights are affine-compatible, including the
            out-of-bounds zero-contribution rule (handled via the weight
            sum).  Main use: pooling directly from the uint8 eval upload.

    Returns:
        (R, pooled_h, pooled_w, C) pooled features (float32 when the input
        is uint8, else the input dtype).
    """
    pooled_h, pooled_w = output_size
    height, width, channels = features.shape
    rois = rois.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    gh_s, gw_s = _grid_pair(
        sampling_ratio if sampling_ratio > 0 else max_sampling_ratio
    )

    cx = rois[:, 0] * spatial_scale - offset  # (R,)
    cy = rois[:, 1] * spatial_scale - offset
    rw = rois[:, 2] * spatial_scale
    rh = rois[:, 3] * spatial_scale
    theta = rois[:, 4] * jnp.pi / 180.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    bin_h = rh / pooled_h  # (R,)
    bin_w = rw / pooled_w
    if sampling_ratio > 0:
        g_h = jnp.full_like(bin_h, sampling_ratio)
        g_w = jnp.full_like(bin_w, sampling_ratio)
    else:
        g_h = jnp.clip(jnp.ceil(rh / pooled_h), 1, gh_s)
        g_w = jnp.clip(jnp.ceil(rw / pooled_w), 1, gw_s)

    # Flat sample coordinates: (R, S) with S = ph*pw*gh*gw minor-most.
    ph = jnp.arange(pooled_h, dtype=jnp.float32)
    pw = jnp.arange(pooled_w, dtype=jnp.float32)
    gih = jnp.arange(gh_s, dtype=jnp.float32)
    giw = jnp.arange(gw_s, dtype=jnp.float32)

    # roi-frame offsets, broadcast over (R, ph, pw, gh, gw) then flattened.
    yy = (
        -rh[:, None, None] / 2.0
        + ph[None, :, None] * bin_h[:, None, None]
        + (gih[None, None, :] + 0.5) * bin_h[:, None, None] / g_h[:, None, None]
    )  # (R, ph, gh)
    xx = (
        -rw[:, None, None] / 2.0
        + pw[None, :, None] * bin_w[:, None, None]
        + (giw[None, None, :] + 0.5) * bin_w[:, None, None] / g_w[:, None, None]
    )  # (R, pw, gw)

    r = rois.shape[0]
    s = pooled_h * pooled_w * gh_s * gw_s
    yy_f = jnp.broadcast_to(
        yy[:, :, None, :, None], (r, pooled_h, pooled_w, gh_s, gw_s)
    ).reshape(r, s)
    xx_f = jnp.broadcast_to(
        xx[:, None, :, None, :], (r, pooled_h, pooled_w, gh_s, gw_s)
    ).reshape(r, s)

    y = yy_f * cos_t[:, None] - xx_f * sin_t[:, None] + cy[:, None]  # (R, S)
    x = yy_f * sin_t[:, None] + xx_f * cos_t[:, None] + cx[:, None]

    # detectron2 boundary handling.
    outside = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y).astype(jnp.int32), height - 1)
    x_low = jnp.minimum(jnp.floor(x).astype(jnp.int32), width - 1)
    y_high = jnp.minimum(y_low + 1, height - 1)
    x_high = jnp.minimum(x_low + 1, width - 1)
    y = jnp.where(y_low >= height - 1, y_low.astype(y.dtype), y)
    x = jnp.where(x_low >= width - 1, x_low.astype(x.dtype), x)
    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx

    # Per-bin sampling mask and normalization.
    grid_mask = (
        (gih[None, :, None] < g_h[:, None, None])
        & (giw[None, None, :] < g_w[:, None, None])
    )  # (R, gh, gw)
    mask_f = jnp.broadcast_to(
        grid_mask[:, None, None, :, :], (r, pooled_h, pooled_w, gh_s, gw_s)
    ).reshape(r, s)
    count = (g_h * g_w).astype(features.dtype)  # (R,)

    w00 = jnp.where(outside | ~mask_f, 0.0, hy * hx) / count[:, None]
    w01 = jnp.where(outside | ~mask_f, 0.0, hy * lx) / count[:, None]
    w10 = jnp.where(outside | ~mask_f, 0.0, ly * hx) / count[:, None]
    w11 = jnp.where(outside | ~mask_f, 0.0, ly * lx) / count[:, None]

    i00 = (y_low * width + x_low).reshape(-1)  # (R*S,)

    if packed_taps is None:
        packed_taps = channels <= 8
    if features.dtype == jnp.uint8 and packed_taps:
        # uint8 source (the eval upload): pack the four shifted tap copies
        # as 4C uint8 = C gathered uint32 words per pixel row — HALF the
        # elements of the bf16-pair packing below, and the gather cost is
        # element-count bound (PERF_NOTES round 2).  Bilinear runs in f32
        # after unpacking (more precise than the bf16 path it replaces).
        sx = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)), mode="edge")
        sy = jnp.pad(features[1:], ((0, 1), (0, 0), (0, 0)), mode="edge")
        sxy = jnp.pad(sx[1:], ((0, 1), (0, 0), (0, 0)), mode="edge")
        packed = jnp.concatenate([features, sx, sy, sxy], axis=-1)
        words = jax.lax.bitcast_convert_type(
            packed.reshape(height * width, channels, 4), jnp.uint32
        )  # (H*W, C)
        taps = jax.lax.bitcast_convert_type(words[i00], jnp.uint8).reshape(
            -1, 4 * channels
        ).astype(jnp.float32)  # (R*S, 4C)
        ws = [w00, w01, w10, w11]
        w4 = jnp.stack([w.reshape(-1) for w in ws], axis=-1)  # (R*S, 4) f32
        expand = jnp.kron(jnp.eye(4), jnp.ones((1, channels))).astype(jnp.float32)
        collapse = jnp.kron(jnp.ones((4, 1)), jnp.eye(channels)).astype(jnp.float32)
        acc = (taps * (w4 @ expand)) @ collapse  # (R*S, C) f32
        if normalize is not None:
            mean, std = normalize
            wsum = (w00 + w01 + w10 + w11).reshape(-1, 1)  # (R*S, 1)
            acc = (acc - wsum * mean.reshape(1, -1)) / std.reshape(1, -1)
        acc = acc.reshape(r, pooled_h * pooled_w, gh_s * gw_s, channels).sum(axis=2)
        return acc.reshape(r, pooled_h, pooled_w, channels)
    if normalize is not None:
        raise NotImplementedError("normalize fold requires a uint8 input")
    if packed_taps:
        # Small-channel maps (the raw-image crop pooler): pack the four
        # bilinear taps as channel groups of ONE shifted image —
        # [I, I>>x, I>>y, I>>xy] with edge padding (edge replication equals
        # the index clamping above) — so a single row gather fetches all
        # four taps.  Gather op count drops 4x; bytes are unchanged.
        sx = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)), mode="edge")
        sy = jnp.pad(features[1:], ((0, 1), (0, 0), (0, 0)), mode="edge")
        sxy = jnp.pad(sx[1:], ((0, 1), (0, 0), (0, 0)), mode="edge")
        packed = jnp.concatenate([features, sx, sy, sxy], axis=-1)
        flat = packed.reshape(height * width, 4 * channels)
        if features.dtype == jnp.bfloat16 and (4 * channels) % 2 == 0:
            # The gather's cost scales with the per-row ELEMENT count, not
            # bytes (the TPU lowering reads row elements individually —
            # measured 8.6 ms at 1.64M x 12 bf16, and a 4x-wider paired
            # variant was proportionally slower). Bit-pack adjacent bf16
            # pairs into f32 lanes so each row is half the elements; pure
            # bit movement, exactly reversed after the gather.
            f32rows = jax.lax.bitcast_convert_type(
                flat.reshape(height * width, 2 * channels, 2), jnp.float32
            )
            taps = jax.lax.bitcast_convert_type(
                f32rows[i00], jnp.bfloat16
            ).reshape(-1, 4 * channels)
        else:
            taps = flat[i00]  # (R*S, 4C)
        ws = [w00, w01, w10, w11]
        if channels >= 64:
            # Wide channels: slice the gathered groups directly (each slice
            # (R*S, C) is well tiled) and weighted-sum.
            acc = sum(
                taps[:, k * channels : (k + 1) * channels]
                * ws[k].reshape(-1, 1).astype(features.dtype)
                for k in range(4)
            )
        else:
            # Narrow channels: constant matmuls avoid (R*S, C) temporaries
            # with tiny minor dims.
            w4 = jnp.stack([w.reshape(-1) for w in ws], axis=-1).astype(features.dtype)
            expand = jnp.kron(jnp.eye(4), jnp.ones((1, channels))).astype(features.dtype)
            collapse = jnp.kron(jnp.ones((4, 1)), jnp.eye(channels)).astype(features.dtype)
            acc = (taps * (w4 @ expand)) @ collapse  # (R*S, C)
    else:
        i01 = (y_low * width + x_high).reshape(-1)
        i10 = (y_high * width + x_low).reshape(-1)
        i11 = (y_high * width + x_high).reshape(-1)

        # Row-major gather: (H*W, C)[(R*S,)] -> (R*S, C).  Rows are
        # contiguous C-sized blocks and the lane axis carries C.
        flat = features.reshape(height * width, channels)
        acc = (
            flat[i00] * w00.reshape(-1, 1).astype(features.dtype)
            + flat[i01] * w01.reshape(-1, 1).astype(features.dtype)
            + flat[i10] * w10.reshape(-1, 1).astype(features.dtype)
            + flat[i11] * w11.reshape(-1, 1).astype(features.dtype)
        )  # (R*S, C)

    # Sum the g*g samples of each bin: (R, ph*pw, g*g, C) -> (R, ph*pw, C).
    acc = acc.reshape(r, pooled_h * pooled_w, gh_s * gw_s, channels).sum(axis=2)
    return acc.reshape(r, pooled_h, pooled_w, channels)


@partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "max_sampling_ratio",
        "bulk_sampling_ratio",
        "large_roi_budget",
        "aligned",
    ),
)
def roi_align_rotated_adaptive(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: tuple,
    spatial_scale: float = 1.0,
    max_sampling_ratio: int = 4,
    bulk_sampling_ratio: int = 2,
    large_roi_budget: int = 16,
    aligned: bool = True,
) -> jnp.ndarray:
    """Adaptive-grid (``sampling_ratio=0``) pooling, split by grid need.

    The static-shape realisation of d2's adaptive grid gathers the FULL
    ``max_sampling_ratio``² grid for every roi and masks unused samples —
    but word-box statistics put >90% of rois at grid 1-2, so most of the
    gather traffic is masked-out waste.  This variant runs a bulk pass whose
    static grid is ``bulk_sampling_ratio`` (exact for every roi whose d2
    grid fits) plus a full-cap pass on (up to ``large_roi_budget``) rois
    that need a finer grid, scattered back over the bulk result.

    Mathematically identical to the monolithic cap pass whenever at most
    ``large_roi_budget`` rois exceed the bulk grid (masked samples
    contribute exact zeros, so buffer capacity does not change the sums);
    overflow rois beyond the budget fall back to the bulk grid.  In
    practice outputs can differ by a few ULPs of the sample coordinates:
    XLA fuses the rotation arithmetic (``yy*cos - xx*sin + cy``)
    differently at different static sample counts (FMA vs separate
    mul/add), so compare with a ~1e-4 tolerance, not bit equality.
    Measured 7.5 -> ~4 ms for the 100-word 8x32 recognizer pool on v5e.

    Both grid caps accept per-axis ``(grid_h, grid_w)`` pairs — word boxes
    are anisotropic, so e.g. the 8x32 recognizer pool's typical d2 grid is
    (2, 1) and a matching bulk pair halves the bulk gather again.
    """
    pooled_h, pooled_w = output_size
    bh, bw = _grid_pair(bulk_sampling_ratio)
    mh, mw = _grid_pair(max_sampling_ratio)
    if bh >= mh and bw >= mw:
        return roi_align_rotated(
            features, rois, output_size, spatial_scale=spatial_scale,
            sampling_ratio=0, max_sampling_ratio=max_sampling_ratio,
            aligned=aligned,
        )
    rois = rois.astype(jnp.float32)
    rh = rois[:, 3] * spatial_scale
    rw = rois[:, 2] * spatial_scale
    g_h = jnp.ceil(rh / pooled_h)
    g_w = jnp.ceil(rw / pooled_w)
    is_large = (g_h > bh) | (g_w > bw)

    bulk = roi_align_rotated(
        features, rois, output_size, spatial_scale=spatial_scale,
        sampling_ratio=0, max_sampling_ratio=(bh, bw),
        aligned=aligned,
    )

    budget = min(large_roi_budget, rois.shape[0])
    # top_k on the 0/1 mask returns the first `budget` large rois (ties keep
    # index order), padding with non-large indices when there are fewer.
    sel_flag, sel_idx = jax.lax.top_k(is_large.astype(jnp.int32), budget)
    fine = roi_align_rotated(
        features, rois[sel_idx], output_size, spatial_scale=spatial_scale,
        sampling_ratio=0, max_sampling_ratio=max_sampling_ratio,
        aligned=aligned,
    )
    keep = (sel_flag > 0)[:, None, None, None]
    return bulk.at[sel_idx].set(
        jnp.where(keep, fine, bulk[sel_idx]), mode="drop"
    )


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


def _packed_pool_impl(
    flat, level_meta, rois, levels, pooled_h, pooled_w, grid, sampling_ratio
):
    """Core of the packed-pyramid pooler; shapes static except roi values.

    flat: (sum HW, C) concatenated level maps.
    level_meta: (L, 4) float32 rows [stride, H, W, row_offset].
    levels: (R,) level index per roi.
    grid: static sampling cap — int or per-axis (grid_h, grid_w).
    """
    grid_h, grid_w = _grid_pair(grid)
    channels = flat.shape[1]
    r = rois.shape[0]
    meta = level_meta[levels]  # (R, 4)
    stride = meta[:, 0]
    height = meta[:, 1]
    width = meta[:, 2]
    base = meta[:, 3].astype(jnp.int32)
    inv_scale = 1.0 / stride

    cx = rois[:, 0] * inv_scale - 0.5
    cy = rois[:, 1] * inv_scale - 0.5
    rw = rois[:, 2] * inv_scale
    rh = rois[:, 3] * inv_scale
    theta = rois[:, 4] * jnp.pi / 180.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    bin_h = rh / pooled_h
    bin_w = rw / pooled_w
    if sampling_ratio > 0:
        g_h = jnp.full_like(bin_h, sampling_ratio)
        g_w = jnp.full_like(bin_w, sampling_ratio)
    else:
        g_h = jnp.clip(jnp.ceil(rh / pooled_h), 1, grid_h)
        g_w = jnp.clip(jnp.ceil(rw / pooled_w), 1, grid_w)

    ph = jnp.arange(pooled_h, dtype=jnp.float32)
    pw = jnp.arange(pooled_w, dtype=jnp.float32)
    gih = jnp.arange(grid_h, dtype=jnp.float32)
    giw = jnp.arange(grid_w, dtype=jnp.float32)

    yy = (
        -rh[:, None, None] / 2.0
        + ph[None, :, None] * bin_h[:, None, None]
        + (gih[None, None, :] + 0.5) * bin_h[:, None, None] / g_h[:, None, None]
    )
    xx = (
        -rw[:, None, None] / 2.0
        + pw[None, :, None] * bin_w[:, None, None]
        + (giw[None, None, :] + 0.5) * bin_w[:, None, None] / g_w[:, None, None]
    )
    s = pooled_h * pooled_w * grid_h * grid_w
    yy_f = jnp.broadcast_to(yy[:, :, None, :, None], (r, pooled_h, pooled_w, grid_h, grid_w)).reshape(r, s)
    xx_f = jnp.broadcast_to(xx[:, None, :, None, :], (r, pooled_h, pooled_w, grid_h, grid_w)).reshape(r, s)

    y = yy_f * cos_t[:, None] - xx_f * sin_t[:, None] + cy[:, None]
    x = yy_f * sin_t[:, None] + xx_f * cos_t[:, None] + cx[:, None]

    h_r = height[:, None]
    w_r = width[:, None]
    outside = (y < -1.0) | (y > h_r) | (x < -1.0) | (x > w_r)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), h_r - 1)
    x_low = jnp.minimum(jnp.floor(x), w_r - 1)
    y = jnp.where(y_low >= h_r - 1, y_low, y)
    x = jnp.where(x_low >= w_r - 1, x_low, x)
    ly = y - y_low
    lx = x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    yi = y_low.astype(jnp.int32)
    xi = x_low.astype(jnp.int32)
    wi = width.astype(jnp.int32)[:, None]
    yi1 = jnp.minimum(yi + 1, h_r.astype(jnp.int32) - 1)
    xi1 = jnp.minimum(xi + 1, w_r.astype(jnp.int32) - 1)

    grid_mask = (
        (jnp.arange(grid_h)[None, :, None] < g_h[:, None, None])
        & (jnp.arange(grid_w)[None, None, :] < g_w[:, None, None])
    )
    mask_f = jnp.broadcast_to(
        grid_mask[:, None, None, :, :], (r, pooled_h, pooled_w, grid_h, grid_w)
    ).reshape(r, s)
    count = (g_h * g_w)[:, None]
    w00 = jnp.where(outside | ~mask_f, 0.0, hy * hx) / count
    w01 = jnp.where(outside | ~mask_f, 0.0, hy * lx) / count
    w10 = jnp.where(outside | ~mask_f, 0.0, ly * hx) / count
    w11 = jnp.where(outside | ~mask_f, 0.0, ly * lx) / count

    b = base[:, None]
    i00 = (b + yi * wi + xi).reshape(-1)
    i01 = (b + yi * wi + xi1).reshape(-1)
    i10 = (b + yi1 * wi + xi).reshape(-1)
    i11 = (b + yi1 * wi + xi1).reshape(-1)

    acc = (
        flat[i00] * w00.reshape(-1, 1).astype(flat.dtype)
        + flat[i01] * w01.reshape(-1, 1).astype(flat.dtype)
        + flat[i10] * w10.reshape(-1, 1).astype(flat.dtype)
        + flat[i11] * w11.reshape(-1, 1).astype(flat.dtype)
    )
    acc = acc.reshape(r, pooled_h * pooled_w, grid_h * grid_w, channels).sum(axis=2)
    return acc.reshape(r, pooled_h, pooled_w, channels)


def multilevel_roi_align_rotated_packed(
    features: list,
    rois: jnp.ndarray,
    output_size: tuple,
    strides: list,
    sampling_ratio: int = 0,
    max_sampling_ratio: int = 4,
    bulk_sampling_ratio: int = 0,
    large_roi_budget: int = 16,
) -> jnp.ndarray:
    """detectron2 multi-level ``ROIPooler``, single-gather formulation.

    Instead of pooling every roi from every level and selecting (a 5x
    compute/gather overhead), the level maps are concatenated row-wise into
    one flat (sum HW, C) buffer and each roi's samples index its assigned
    level through a per-roi (stride, H, W, row-offset) record.  Exactly the
    detectron2 assignment + ROIAlignRotated semantics at 1/L of the work.

    With ``sampling_ratio=0`` and ``0 < bulk_sampling_ratio <
    max_sampling_ratio``, uses the split-capacity strategy of
    ``roi_align_rotated_adaptive``: a bulk pass at the small static grid
    plus a full-grid pass on up to ``large_roi_budget`` rois that need it.
    """
    pooled_h, pooled_w = output_size
    min_level = int(strides[0]).bit_length() - 1
    levels = assign_boxes_to_levels(rois, min_level, min_level + len(features) - 1)
    channels = features[0].shape[-1]
    flats = [f.reshape(-1, channels) for f in features]
    sizes = [f.shape[0] * f.shape[1] for f in features]
    offsets = [0]
    for sz in sizes[:-1]:
        offsets.append(offsets[-1] + sz)
    flat = jnp.concatenate(flats, axis=0)
    level_meta = jnp.asarray(
        [
            [float(s), float(f.shape[0]), float(f.shape[1]), float(off)]
            for f, s, off in zip(features, strides, offsets)
        ],
        jnp.float32,
    )
    rois = rois.astype(jnp.float32)
    bh, bw = _grid_pair(bulk_sampling_ratio)
    mh, mw = _grid_pair(max_sampling_ratio)
    split = (
        sampling_ratio == 0 and bh > 0 and bw > 0 and (bh < mh or bw < mw)
    )
    grid = sampling_ratio if sampling_ratio > 0 else (
        (bh, bw) if split else (mh, mw)
    )
    pooled = _packed_pool_impl(
        flat, level_meta, rois, levels,
        pooled_h, pooled_w, grid, sampling_ratio,
    )
    if not split:
        return pooled

    stride_r = level_meta[levels, 0]
    g_h = jnp.ceil(rois[:, 3] / stride_r / pooled_h)
    g_w = jnp.ceil(rois[:, 2] / stride_r / pooled_w)
    is_large = (g_h > bh) | (g_w > bw)
    budget = min(large_roi_budget, rois.shape[0])
    sel_flag, sel_idx = jax.lax.top_k(is_large.astype(jnp.int32), budget)
    fine = _packed_pool_impl(
        flat, level_meta, rois[sel_idx], levels[sel_idx],
        pooled_h, pooled_w, max_sampling_ratio, 0,
    )
    keep = (sel_flag > 0)[:, None, None, None]
    return pooled.at[sel_idx].set(
        jnp.where(keep, fine, pooled[sel_idx]), mode="drop"
    )


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


def multilevel_roi_align_rotated_pallas(
    features: list,
    rois: jnp.ndarray,
    output_size: tuple,
    strides: list,
    sampling_ratio: int = 0,
    max_sampling_ratio: int = 4,
) -> jnp.ndarray:
    """Multi-level pooler on the Pallas DMA-tile kernel
    (``TPU.ROI_ALIGN_BACKEND: pallas``).

    Alternative backend for the box/mask poolers: bit-exact vs the XLA
    gather formulation (tested to 1e-7) but measured slower on v5e (the
    per-roi sequential sampling grid serializes, PERF_NOTES round 1) — the
    XLA packed-pyramid path stays the default.  Each roi is pooled from
    every level and selected by the detectron2 level assignment; the
    Pallas kernel's bounded-tile domain matches the box/mask pooler
    (FPN-assigned rois span < ~32 feature units).
    """
    from .pallas_roi_align import roi_align_rotated_pallas

    min_level = int(strides[0]).bit_length() - 1
    levels = assign_boxes_to_levels(rois, min_level, min_level + len(features) - 1)
    pooled = []
    for f, s in zip(features, strides):
        pooled.append(
            roi_align_rotated_pallas(
                f,
                rois,
                output_size,
                spatial_scale=1.0 / s,
                sampling_ratio=sampling_ratio,
                max_sampling_ratio=max_sampling_ratio,
            )
        )
    stacked = jnp.stack(pooled, axis=0)
    return jnp.take_along_axis(
        stacked, levels[None, :, None, None, None], axis=0
    )[0]
