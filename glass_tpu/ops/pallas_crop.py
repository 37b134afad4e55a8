"""Pallas TPU kernel for the raw-image rotated crop pooler.

Replaces the XLA bit-packed gather formulation of ``roi_align_rotated`` for
the GLASS 128x128 raw-image word crops (reference ``recognizers_hybrid_head
.py:490-500``: ROIAlignRotated over the raw image, scales=[1], grid 1x1) —
the single most expensive op of the serving frame: the XLA gather issues
R*128*128 independent 4-tap row reads whose cost is per-ELEMENT bound
(~5.5 ms/frame at 100 words, PERF_NOTES), 400x below HBM bandwidth.

This kernel instead DMAs each roi's bounding tile into VMEM once
(contiguous, bandwidth-efficient) and resolves the rotated bilinear
sampling with vectorized in-register ``tpu.dynamic_gather`` ops.  The TPU
constraint is that dynamic gathers only operate along the LANE axis of a
single vreg (the sublane form rejects multi-vreg operands), so a 2-D
gather must be decomposed into two lane-axis gathers with a transpose in
between:

* pass 1 (rows = tile y, lanes = tile x): for every tile row ``a`` and
  output column ``j``, gather a 4-wide window of tile columns around
  ``zeta(a, j) = floor(psi_j(a))``, where ``psi_j`` is the image-x of
  output column j's sampling line at image row a.  After the per-roi
  role-normalization below, the line slope ``|vx/vy| <= 1`` bounds every
  bilinear tap of every output pixel on that line inside the window
  (proof in ``_crop_kernel``).
* transpose each window plane (rows = output j, lanes = tile y).
* pass 2: for each output pixel (i, j), gather the tap rows
  ``y_low/y_high`` along the lane (=tile y) axis.
* tap selection: the window member holding tile column ``x_low + dx`` is
  selected by INDEX EQUALITY — the actual gathered column index is routed
  through the same two passes — so FMA reassociation between the two
  passes can never select a neighbouring texel.

Role normalization: when ``|vx| > |vy|`` (box closer to vertical than
horizontal) the y/x roles are swapped host-side and the kernel transposes
the tile, which restores ``|slope| <= 1``.

Semantics are exactly detectron2's ``ROIAlignRotated`` at
``sampling_ratio=1`` (the serving crop config): aligned half-pixel offset,
out-of-[-1, extent] taps contribute zero, coordinate clamping — mirrored
from ``roi_align_rotated`` in ``roi_align_rotated.py``.

Forward-only (the serving path; training keeps the differentiable XLA
gather).  Rois whose sampling bbox exceeds the 128x128 tile are pooled by
an XLA fallback pass in budget-sized chunks (while_loop until every large
roi is rescued — exact for ANY number of large rois; the budget only sets
the per-iteration capacity).

DMA alignment (measured on the v5e Mosaic toolchain): a dynamic slice of
an HBM memref must have its offsets divisible by the (8, 128) tiling —
unaligned offsets fail to compile ("Failed to prove that a tile index in
dimension 1 is divisible by the tiling (8)"), while ``pl.multiple_of``-
hinted aligned offsets work.  So the image is zero-padded to (8, 128)-
aligned extents host-side, each roi DMAs an ALIGNED (136, 256) bounding
tile (origin rounded down to the tiling), and the residual offset
(dy <= 8, dx <= 128) is resolved in-register with dynamic lane/sublane
rolls (``pltpu.roll`` matches ``np.roll`` for positive shifts) before the
static 128x128 slice.  All downstream index arithmetic keeps the TRUE
role origin, so the gather logic is untouched by the alignment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_rotated import roi_align_rotated

TILE = 128  # output extent; single vreg along lanes.
TY = 136    # DMA tile rows: 128 + 8 alignment slack (17 sublane tiles)
TX = 256    # DMA tile cols: 128 + 128 alignment slack (2 lane tiles)


def _crop_kernel(scal_ref, img_ref, out_ref, tile_ref, geom_ref, sem):
    """One roi per grid step.

    scal_ref: (R, 16) f32 scalar rows (prefetched), per roi:
        [y00, vy, uy, x00, vx, ux, y0, x0, Hf, Wf, swap, valid,
         iy0a, ix0a] + pad.  The (y, x) affine is ALREADY role-normalized
        host-side (|vx| <= |vy|); ``swap`` says the tile must be
        transposed; (iy0a, ix0a) is the (8, 128)-ALIGNED image-space DMA
        origin, (y0, x0) the TRUE role-space tile origin.
    img_ref: (3, Hp, Wp) planar image in HBM, extents (8, 128)-aligned.
    out_ref: (1, 3, TILE, TILE) crop for this roi.
    tile_ref: VMEM scratch (3, TY, TX).
    geom_ref: VMEM scratch (3, TILE, TILE) f32 — a materialization
        round-trip for the floor planes (zeta, y_low, x_low).  The
        compiler is free to re-evaluate a traced expression per consumer
        with different FMA contraction; at a knife-edge sample (position
        exactly on an integer) two materializations of the same floor()
        can then DISAGREE, and an index used by the value gather would
        desynchronize from the selector built on another copy (observed:
        0.3 abs error on ~1%% of pixels at 45-degree-ish geometry).
        Storing the floors once and deriving every index, selector and
        weight from the LOADED planes makes all downstream arithmetic
        exact integer math — recompute-safe.
    """
    r = pl.program_id(0)
    y0i = scal_ref[r, 6].astype(jnp.int32)
    x0i = scal_ref[r, 7].astype(jnp.int32)
    swap = scal_ref[r, 10] > 0.5
    iy0a = pl.multiple_of(scal_ref[r, 12].astype(jnp.int32), 8)
    ix0a = pl.multiple_of(scal_ref[r, 13].astype(jnp.int32), 128)

    # --- aligned image-space tile DMA (Mosaic requires (8, 128)-aligned
    # dynamic offsets on HBM slices; see module docstring) --------------
    cp = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(iy0a, TY), pl.ds(ix0a, TX)], tile_ref, sem
    )
    cp.start()
    cp.wait()

    # Residual offsets of the true image-space origin inside the aligned
    # tile.  swap=True means the role-normalized (y, x) are the image's
    # (x, y), so the image-space origin is the role origin swapped back.
    dy = jax.lax.select(swap, x0i, y0i) - iy0a  # [0, 8]
    dx = jax.lax.select(swap, y0i, x0i) - ix0a  # [0, 128]

    y00 = scal_ref[r, 0]
    vy = scal_ref[r, 1]
    uy = scal_ref[r, 2]
    x00 = scal_ref[r, 3]
    vx = scal_ref[r, 4]
    ux = scal_ref[r, 5]
    hf = scal_ref[r, 8]
    wf = scal_ref[r, 9]
    valid = scal_ref[r, 11]
    y0 = y0i.astype(jnp.float32)
    x0 = x0i.astype(jnp.float32)

    # slope of the output-column lines in role space; |s| <= 1 by
    # normalization (vy == 0 only for degenerate rois, masked by valid).
    s = vx / jnp.where(jnp.abs(vy) < 1e-20, 1.0, vy)
    s = jnp.where(valid > 0.5, s, 0.0)

    # ---- pass 1: column-window gathers over (tile row a, output col j)
    # Mosaic iota is integer-only; cast to f32 for the affine math.
    a_f = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0).astype(jnp.float32)
    j_f = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(jnp.float32)
    # psi_j(a) = image-x of output column j's line at image row y0+a.
    psi = x00 + j_f * ux + (y0 + a_f - (y00 + j_f * uy)) * s

    # ---- output-pixel geometry in TRANSPOSED orientation (rows = output
    # column j, lanes = output row i): pass 2 gathers along the tile-y
    # lane axis of the transposed pass-1 planes.
    i_t = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1).astype(jnp.float32)
    j_t = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0).astype(jnp.float32)
    y = y00 + i_t * vy + j_t * uy
    x = x00 + i_t * vx + j_t * ux

    # Materialize the floor planes ONCE (see geom_ref docstring), then
    # derive all indices/selectors from the loaded copies.
    geom_ref[0] = jnp.floor(psi)
    geom_ref[1] = jnp.minimum(jnp.floor(jnp.maximum(y, 0.0)), hf - 1.0)
    geom_ref[2] = jnp.minimum(jnp.floor(jnp.maximum(x, 0.0)), wf - 1.0)
    zeta = geom_ref[0]
    y_low = geom_ref[1]
    x_low = geom_ref[2]

    idx1 = [
        jnp.clip(zeta.astype(jnp.int32) + (m - 1) - x0i, 0, TILE - 1)
        for m in range(4)
    ]

    # detectron2 boundary handling (roi_align_rotated.py:144-156).
    outside = (y < -1.0) | (y > hf) | (x < -1.0) | (x > wf)
    y_c = jnp.maximum(y, 0.0)
    x_c = jnp.maximum(x, 0.0)
    y_high = jnp.minimum(y_low + 1.0, hf - 1.0)
    x_high = jnp.minimum(x_low + 1.0, wf - 1.0)
    y_e = jnp.where(y_low >= hf - 1.0, y_low, y_c)
    x_e = jnp.where(x_low >= wf - 1.0, x_low, x_c)
    # clip: y/x are free to re-evaluate across a knife-edge of the LOADED
    # floors, leaving an O(ulp) negative fraction.
    ly = jnp.clip(y_e - y_low, 0.0, 1.0)
    lx = jnp.clip(x_e - x_low, 0.0, 1.0)
    hy = 1.0 - ly
    hx = 1.0 - lx
    zero = jnp.zeros_like(ly)
    w00 = jnp.where(outside, zero, hy * hx)
    w01 = jnp.where(outside, zero, hy * lx)
    w10 = jnp.where(outside, zero, ly * hx)
    w11 = jnp.where(outside, zero, ly * lx)

    idx2 = [
        jnp.clip(rho.astype(jnp.int32) - y0i, 0, TILE - 1)
        for rho in (y_low, y_high)
    ]
    # target tile columns for the x taps.
    tcol = [
        jnp.clip(xt.astype(jnp.int32) - x0i, 0, TILE - 1)
        for xt in (x_low, x_high)
    ]

    # Tap selection by INDEX EQUALITY: the pass-1 base column zeta is
    # routed through the same pass-2 gather as the values (carried f32 —
    # tpu.dynamic_gather lowers f32 lanes; bf16 failed on this toolchain;
    # values <= 2^24 are exact), so the selected window member provably
    # holds the tap column even if a recomputation of psi would flip a
    # knife-edge floor.  Window member m holds tile column
    # clamp(zeta + m - 1); among IN-RANGE members the column values are
    # strictly increasing in m, so each x tap matches at most one member
    # (out-of-range members are sentineled to -1; a clamped-to-edge
    # TARGET column only has weight > 0 when the true tap is that edge
    # texel, in which case the in-range member holds it).
    zeta_j = zeta.T  # (j, a)
    zeta_t = jnp.take_along_axis(  # zeta at (a = rho_dy - y0, j) -> (j, i)
        zeta_j, idx2[0], axis=1, mode="promise_in_bounds"
    )
    zeta_t1 = jnp.take_along_axis(
        zeta_j, idx2[1], axis=1, mode="promise_in_bounds"
    )
    tcol_f = [t.astype(jnp.float32) for t in tcol]
    # per (m, dy) selection factor: weight where this member holds the
    # x_low tap, plus weight where it holds the x_high tap.
    # NB: loop variables must not be named dy/dx — those are the kernel-scope
    # DMA residual offsets captured by the _realign_* closures below.
    tfac = [[None, None] for _ in range(4)]
    for m in range(4):
        for tap, zt in enumerate((zeta_t, zeta_t1)):
            raw = zt - x0 + (m - 1)  # unclamped member column, f32
            member = jnp.where((raw >= 0) & (raw <= TILE - 1), raw, -1.0)
            w_lo = (w00, w01, w10, w11)[tap * 2]
            w_hi = (w00, w01, w10, w11)[tap * 2 + 1]
            tfac[m][tap] = jnp.where(member == tcol_f[0], w_lo, 0.0) + jnp.where(
                member == tcol_f[1], w_hi, 0.0
            )

    # Realign the (TY, TX) aligned tile to the TRUE origin: roll by the
    # residual offsets (pltpu.roll == np.roll for positive shifts), then
    # slice the leading 128x128 statically.  roll(t, A - off)[ :128] ==
    # t[off : off + 128] for off in [0, A - 128].  Always roll in IMAGE
    # orientation — lane axis TX = 256 stays 128-aligned (Mosaic rejects
    # dynamic_rotate on a 136-lane vector) — and transpose the 128x128
    # slice afterwards for the swapped role assignment.
    def _realign(tc):  # (TY, TX) rows = image y, lanes = image x
        t = pltpu.roll(tc, jax.lax.rem(TY - dy, TY), 0)[:TILE]
        return pltpu.roll(t, jax.lax.rem(TX - dx, TX), 1)[:, :TILE]

    def gather_channel(c):
        t_i = _realign(tile_ref[c])
        t_c = jax.lax.cond(swap, lambda u: u.T, lambda u: u, t_i)
        acc = jnp.zeros((TILE, TILE), jnp.float32)
        for m in range(4):
            a_m = jnp.take_along_axis(
                t_c, idx1[m], axis=1, mode="promise_in_bounds"
            ).T  # (j, a)
            for tap in range(2):
                b = jnp.take_along_axis(
                    a_m, idx2[tap], axis=1, mode="promise_in_bounds"
                ).astype(jnp.float32)
                acc = acc + b * tfac[m][tap]
        return (acc * valid).T.astype(out_ref.dtype)  # (i, j)

    for c in range(3):
        out_ref[0, c] = gather_channel(c)


def _roi_scalars(
    rois: jnp.ndarray, out_hw, height: int, width: int, hp: int, wp: int
):
    """(R, 5) XYWHA -> (R, 16) f32 kernel scalar rows + large-roi mask.

    (hp, wp): padded image extents (multiples of 8 / 128) — the aligned
    DMA origin is clamped so the (TY, TX) tile stays inside them.
    """
    ph, pw = out_hw
    rois = rois.astype(jnp.float32)
    ccx = rois[:, 0] - 0.5
    ccy = rois[:, 1] - 0.5
    w = rois[:, 2]
    h = rois[:, 3]
    theta = rois[:, 4] * (jnp.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    bh = h / ph
    bw = w / pw
    # y(i,j) = y00 + i*vy + j*uy ; x(i,j) = x00 + i*vx + j*ux
    vy = bh * cos_t
    uy = -bw * sin_t
    vx = bh * sin_t
    ux = bw * cos_t
    yy0 = -h / 2.0 + 0.5 * bh
    xx0 = -w / 2.0 + 0.5 * bw
    y00 = yy0 * cos_t - xx0 * sin_t + ccy
    x00 = yy0 * sin_t + xx0 * cos_t + ccx

    # sampling bbox (+1 tap, +1 safety) and tile origin per role axis.
    ey = (jnp.abs(w * sin_t) + jnp.abs(h * cos_t)) / 2.0
    ex = (jnp.abs(w * cos_t) + jnp.abs(h * sin_t)) / 2.0
    large = (2.0 * ey + 6.0 > TILE) | (2.0 * ex + 6.0 > TILE)
    valid = (w > 0) & (h > 0)

    swap = jnp.abs(vx) > jnp.abs(vy)

    def pick(a, b):
        return jnp.where(swap, b, a)

    # role-normalized affine (y' is the axis along which lines move
    # steepest; |vx'| <= |vy'|).
    ny00, nvy, nuy = pick(y00, x00), pick(vy, vx), pick(uy, ux)
    nx00, nvx, nux = pick(x00, y00), pick(vx, vy), pick(ux, uy)
    nh = pick(jnp.full_like(y00, height), jnp.full_like(y00, width))
    nw = pick(jnp.full_like(y00, width), jnp.full_like(y00, height))
    ncy = pick(ccy, ccx)
    ncx = pick(ccx, ccy)
    ney = pick(ey, ex)
    nex = pick(ex, ey)

    y0 = jnp.clip(
        jnp.floor(ncy - ney) - 2.0, 0.0, jnp.maximum(nh - TILE, 0.0)
    )
    x0 = jnp.clip(
        jnp.floor(ncx - nex) - 2.0, 0.0, jnp.maximum(nw - TILE, 0.0)
    )

    # Aligned image-space DMA origin: the role origin swapped back to
    # image axes, rounded down to the (8, 128) tiling, clamped so the
    # (TY, TX) tile stays inside the PADDED extents (hp - TY and wp - TX
    # are tiling-aligned because hp, wp, TY, TX all are).  The residual
    # dy = iy0 - iy0a is <= 8 and dx <= 128, which the TY/TX slack covers.
    iy0 = jnp.where(swap, x0, y0)
    ix0 = jnp.where(swap, y0, x0)
    iy0a = jnp.clip(jnp.floor(iy0 / 8.0) * 8.0, 0.0, float(hp - TY))
    ix0a = jnp.clip(jnp.floor(ix0 / 128.0) * 128.0, 0.0, float(wp - TX))

    scal = jnp.stack(
        [
            ny00, nvy, nuy, nx00, nvx, nux, y0, x0, nh, nw,
            swap.astype(jnp.float32), valid.astype(jnp.float32),
            iy0a, ix0a,
            jnp.zeros_like(y00), jnp.zeros_like(y00),
        ],
        axis=1,
    )
    return scal, large & valid


@partial(jax.jit, static_argnames=("out_hw", "large_roi_budget", "interpret"))
def crop_rois_pallas(
    image: jnp.ndarray,
    rois: jnp.ndarray,
    out_hw: tuple = (TILE, TILE),
    large_roi_budget: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotated 128x128 crops from an (H, W, 3) image, d2-exact.

    Equivalent to ``roi_align_rotated(image, rois, out_hw, spatial_scale=1,
    sampling_ratio=1)`` (forward only).  Requires H, W >= 128 and
    out_hw == (128, 128); callers gate on those statically.

    Returns (R, 128, 128, 3) in ``image.dtype``'s f32 upcast semantics
    (f32 accumulation, cast back to image dtype).
    """
    if out_hw != (TILE, TILE):
        raise ValueError(f"pallas crop kernel is fixed at {TILE}x{TILE}")
    height, width, _ = image.shape
    hp = -(-height // 8) * 8
    wp = -(-width // 128) * 128
    if hp < TY or wp < TX:
        raise ValueError("image smaller than the DMA tile; use the XLA path")
    r = rois.shape[0]

    # f32 tile planes regardless of image dtype: tpu.dynamic_gather only
    # lowers f32/i32 lanes on this toolchain (bf16 rejected).  Zero-pad to
    # tiling-aligned extents so every aligned tile origin is in bounds
    # (padded texels only ever multiply zero selector weights).
    planar = jnp.transpose(image, (2, 0, 1)).astype(jnp.float32)  # (3, H, W)
    planar = jnp.pad(planar, ((0, 0), (0, hp - height), (0, wp - width)))
    scal, large = _roi_scalars(rois, out_hw, height, width, hp, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 3, TILE, TILE),
            lambda rr, *_: (rr, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, TY, TX), jnp.float32),
            pltpu.VMEM((3, TILE, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    crops = pl.pallas_call(
        _crop_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, 3, TILE, TILE), image.dtype),
        # out dtype follows the image: the kernel accumulates f32 and
        # casts on the final store.
        interpret=interpret,
    )(scal, planar)
    crops = jnp.transpose(crops, (0, 2, 3, 1))  # (R, 128, 128, 3)

    # XLA fallback for rois whose sampling bbox exceeds the tile — the
    # kernel's taps clamp to the tile edge there, which would silently
    # smear the crop.  Rescue in budget-sized chunks inside a while_loop
    # so EVERY large roi is exact (one iteration in the common case;
    # pathological images pay more iterations, never corruption).  A
    # while_loop stays adaptive under vmap (trip count = worst image in
    # the batch), unlike a cond, which vmap turns into both-branches.
    budget = min(large_roi_budget, r)
    if budget:

        def _rescue(state):
            crops, rescued = state
            flags = large & ~rescued
            sel_flag, sel_idx = jax.lax.top_k(flags.astype(jnp.int32), budget)
            fine = roi_align_rotated(
                image, rois[sel_idx], out_hw, spatial_scale=1.0, sampling_ratio=1
            ).astype(crops.dtype)
            keep = sel_flag > 0
            crops = crops.at[sel_idx].set(
                jnp.where(keep[:, None, None, None], fine, crops[sel_idx]),
                mode="drop",
            )
            rescued = rescued.at[sel_idx].set(
                rescued[sel_idx] | keep, mode="drop"
            )
            return crops, rescued

        crops, _ = jax.lax.while_loop(
            lambda st: jnp.any(large & ~st[1]),
            _rescue,
            (crops, jnp.zeros((r,), jnp.bool_)),
        )
    return crops
