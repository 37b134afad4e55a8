import numpy as np
import jax.numpy as jnp

from glass_tpu.ops import roi_align_rotated


def _np_roi_align_rotated(feat_hwc, roi, out_hw, scale, sampling_ratio, max_sr=4):
    """Straightforward numpy port of the detectron2 kernel semantics."""
    H, W, C = feat_hwc.shape
    ph_n, pw_n = out_hw
    cx = roi[0] * scale - 0.5
    cy = roi[1] * scale - 0.5
    rw = roi[2] * scale
    rh = roi[3] * scale
    theta = np.deg2rad(roi[4])
    ct, st = np.cos(theta), np.sin(theta)
    bin_h = rh / ph_n
    bin_w = rw / pw_n
    gh = sampling_ratio if sampling_ratio > 0 else min(max_sr, max(1, int(np.ceil(rh / ph_n))))
    gw = sampling_ratio if sampling_ratio > 0 else min(max_sr, max(1, int(np.ceil(rw / pw_n))))
    out = np.zeros((ph_n, pw_n, C), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y0, x0 = min(y0, H - 1), min(x0, W - 1)
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        if y0 >= H - 1:
            y = float(y0)
        if x0 >= W - 1:
            x = float(x0)
        ly, lx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hwc[y0, x1] * (1 - ly) * lx
            + feat_hwc[y1, x0] * ly * (1 - lx)
            + feat_hwc[y1, x1] * ly * lx
        )

    for ph in range(ph_n):
        for pw in range(pw_n):
            acc = np.zeros(C)
            for iy in range(gh):
                yy = -rh / 2 + ph * bin_h + (iy + 0.5) * bin_h / gh
                for ix in range(gw):
                    xx = -rw / 2 + pw * bin_w + (ix + 0.5) * bin_w / gw
                    y = yy * ct - xx * st + cy
                    x = yy * st + xx * ct + cx
                    acc += bilinear(y, x)
            out[ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_matches_numpy_reference(rng):
    feat = rng.randn(32, 48, 3).astype(np.float32)
    rois = np.array(
        [
            [60.0, 40.0, 48.0, 24.0, 0.0],
            [60.0, 40.0, 48.0, 24.0, 30.0],
            [30.0, 30.0, 40.0, 16.0, -75.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois), (4, 8),
                          spatial_scale=0.5, sampling_ratio=2)
    )
    for i, roi in enumerate(rois):
        ref = _np_roi_align_rotated(feat, roi, (4, 8), 0.5, 2)
        np.testing.assert_allclose(got[i], ref, atol=1e-4)


def test_roi_align_adaptive_sampling(rng):
    feat = rng.randn(64, 64, 2).astype(np.float32)
    rois = np.array(
        [
            [32.0, 32.0, 40.0, 12.0, 15.0],   # grid 2x? adaptive
            [32.0, 32.0, 8.0, 4.0, 0.0],      # grid 1x1
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois), (4, 8),
                          spatial_scale=1.0, sampling_ratio=0, max_sampling_ratio=4)
    )
    for i, roi in enumerate(rois):
        ref = _np_roi_align_rotated(feat, roi, (4, 8), 1.0, 0)
        np.testing.assert_allclose(got[i], ref, atol=1e-4)


def test_roi_align_grad_flows(rng):
    import jax

    feat = jnp.asarray(rng.randn(16, 16, 2).astype(np.float32))
    rois = jnp.array([[8.0, 8.0, 8.0, 8.0, 20.0]])

    def loss(f):
        return jnp.sum(roi_align_rotated(f, rois, (2, 2), 1.0, 2) ** 2)

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_packed_pyramid_matches_per_level_pooler(rng):
    """multilevel_roi_align_rotated_packed vs the pool-all-levels reference
    across levels, angles, sampling ratios, and boundary rois (ADVICE r1)."""
    import jax.numpy as jnp

    from glass_tpu.ops.roi_align_rotated import (
        multilevel_roi_align_rotated,
        multilevel_roi_align_rotated_packed,
    )

    strides = [4, 8, 16, 32]
    feats = [
        jnp.asarray(rng.randn(64 // (s // 4), 96 // (s // 4), 8).astype(np.float32))
        for s in strides
    ]
    boxes = np.array(
        [
            [60.0, 40.0, 30.0, 12.0, 0.0],      # small -> level 0
            [120.0, 80.0, 180.0, 60.0, 25.0],   # medium -> mid level
            [190.0, 120.0, 700.0, 300.0, -40.0],  # large -> top level
            # Boundary roi. Note cx=2.1 not 2.0: at exactly 2.0 a sample
            # lands on y == -1.0, where d2's `outside` test flips on the
            # 1-ulp FMA rounding difference between the two compiled
            # programs (both match the scalar reference within 1 ulp).
            [2.1, 2.1, 16.0, 8.0, 90.0],
            [370.0, 250.0, 40.0, 16.0, -90.0],  # near bottom-right edge
        ],
        np.float32,
    )
    for sr in (0, 2):
        ref = multilevel_roi_align_rotated(
            feats, jnp.asarray(boxes), (7, 7), strides, sampling_ratio=sr
        )
        packed = multilevel_roi_align_rotated_packed(
            feats, jnp.asarray(boxes), (7, 7), strides, sampling_ratio=sr
        )
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(ref), atol=2e-5, err_msg=f"sr={sr}"
        )


def test_adaptive_split_matches_monolithic():
    """roi_align_rotated_adaptive (bulk cap-2 + full-grid pass on large rois)
    must equal the single max-grid pass exactly when the large-roi budget is
    not exceeded — masked samples contribute exact zeros, so buffer capacity
    cannot change the per-bin sums."""
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated_adaptive

    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(60, 90, 16).astype(np.float32))
    n = 40
    # mix: mostly small rois (grid 1-2), a handful needing grid 3-4
    w = np.where(rng.rand(n) < 0.2, rng.rand(n) * 600 + 300, rng.rand(n) * 100 + 16)
    h = np.where(rng.rand(n) < 0.2, rng.rand(n) * 200 + 100, rng.rand(n) * 40 + 10)
    rois = np.stack([
        rng.rand(n) * 300 + 20, rng.rand(n) * 200 + 20, w, h,
        (rng.rand(n) - 0.5) * 180,
    ], 1).astype(np.float32)
    rois_j = jnp.asarray(rois)

    mono = roi_align_rotated(
        feat, rois_j, (8, 32), spatial_scale=0.25,
        sampling_ratio=0, max_sampling_ratio=4,
    )
    split = roi_align_rotated_adaptive(
        feat, rois_j, (8, 32), spatial_scale=0.25,
        max_sampling_ratio=4, bulk_sampling_ratio=2, large_roi_budget=n,
    )
    np.testing.assert_array_equal(np.asarray(split), np.asarray(mono))

    # overflowed budget: large rois beyond the budget fall back to the bulk
    # grid; small rois must still be bit-exact.
    split_tight = roi_align_rotated_adaptive(
        feat, rois_j, (8, 32), spatial_scale=0.25,
        max_sampling_ratio=4, bulk_sampling_ratio=2, large_roi_budget=4,
    )
    g_h = np.ceil(rois[:, 3] * 0.25 / 8)
    g_w = np.ceil(rois[:, 2] * 0.25 / 32)
    small = (g_h <= 2) & (g_w <= 2)
    np.testing.assert_array_equal(
        np.asarray(split_tight)[small], np.asarray(mono)[small]
    )


def test_multilevel_packed_split_matches_monolithic():
    from glass_tpu.ops.roi_align_rotated import multilevel_roi_align_rotated_packed

    rng = np.random.RandomState(5)
    feats = [
        jnp.asarray(rng.randn(64, 96, 8).astype(np.float32)),
        jnp.asarray(rng.randn(32, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(16, 24, 8).astype(np.float32)),
        jnp.asarray(rng.randn(8, 12, 8).astype(np.float32)),
    ]
    strides = [4, 8, 16, 32]
    n = 30
    w = np.where(rng.rand(n) < 0.25, rng.rand(n) * 1000 + 800, rng.rand(n) * 120 + 20)
    h = np.where(rng.rand(n) < 0.25, rng.rand(n) * 300 + 200, rng.rand(n) * 50 + 12)
    rois = jnp.asarray(np.stack([
        rng.rand(n) * 300 + 20, rng.rand(n) * 200 + 10, w, h,
        (rng.rand(n) - 0.5) * 180,
    ], 1).astype(np.float32))

    mono = multilevel_roi_align_rotated_packed(
        feats, rois, (14, 14), strides, sampling_ratio=0, max_sampling_ratio=4,
    )
    split = multilevel_roi_align_rotated_packed(
        feats, rois, (14, 14), strides, sampling_ratio=0, max_sampling_ratio=4,
        bulk_sampling_ratio=2, large_roi_budget=n,
    )
    np.testing.assert_array_equal(np.asarray(split), np.asarray(mono))


def test_mask_pool_bulk1_matches_monolithic_on_word_rois():
    """The 14x14 mask pooler with the per-axis (1, 2) bulk grid
    (TPU.MASK_POOL_BULK_SAMPLING_RATIO) must be bit-exact vs the
    monolithic cap-4 pass on word statistics: text boxes clamp to the
    lowest FPN level where d2's adaptive grid is ceil(h/14) = 1 tall and
    ceil(w/14) <= 2 wide, and the large-roi budget pass covers the
    exceptions."""
    from glass_tpu.ops.roi_align_rotated import multilevel_roi_align_rotated_packed

    rng = np.random.RandomState(11)
    feats = [
        jnp.asarray(rng.randn(64, 96, 8).astype(np.float32)),
        jnp.asarray(rng.randn(32, 48, 8).astype(np.float32)),
        jnp.asarray(rng.randn(16, 24, 8).astype(np.float32)),
        jnp.asarray(rng.randn(8, 12, 8).astype(np.float32)),
    ]
    strides = [4, 8, 16, 32]
    n = 48
    # word-like rois (height 8-40 px, width 16-118 px) + a few large ones
    big = rng.rand(n) < 0.15
    w = np.where(big, rng.rand(n) * 800 + 400, rng.rand(n) * 102 + 16)
    h = np.where(big, rng.rand(n) * 250 + 150, rng.rand(n) * 32 + 8)
    rois = jnp.asarray(np.stack([
        rng.rand(n) * 300 + 20, rng.rand(n) * 200 + 10, w, h,
        (rng.rand(n) - 0.5) * 180,
    ], 1).astype(np.float32))

    mono = multilevel_roi_align_rotated_packed(
        feats, rois, (14, 14), strides, sampling_ratio=0, max_sampling_ratio=4,
    )
    bulk12 = multilevel_roi_align_rotated_packed(
        feats, rois, (14, 14), strides, sampling_ratio=0, max_sampling_ratio=4,
        bulk_sampling_ratio=(1, 2), large_roi_budget=16,
    )
    # tolerance, not bit equality: see the adaptive docstring (XLA fuses
    # the rotation arithmetic differently at different sample counts)
    np.testing.assert_allclose(
        np.asarray(bulk12), np.asarray(mono), atol=1e-4, rtol=0
    )


def test_recognizer_pool_bulk_pair_matches_monolithic_on_word_rois():
    """8x32 recognizer pooler with the (2, 1) bulk pair vs monolithic
    cap-4: typical words are <=2 bins tall and 1 bin wide on the fused
    P2 map; budget pass covers wide words."""
    from glass_tpu.ops.roi_align_rotated import (
        roi_align_rotated,
        roi_align_rotated_adaptive,
    )

    rng = np.random.RandomState(12)
    feat = jnp.asarray(rng.randn(60, 90, 16).astype(np.float32))
    n = 40
    big = rng.rand(n) < 0.15
    w = np.where(big, rng.rand(n) * 400 + 150, rng.rand(n) * 110 + 16)
    h = np.where(big, rng.rand(n) * 150 + 70, rng.rand(n) * 48 + 8)
    rois = jnp.asarray(np.stack([
        rng.rand(n) * 300 + 20, rng.rand(n) * 200 + 20, w, h,
        (rng.rand(n) - 0.5) * 180,
    ], 1).astype(np.float32))

    mono = roi_align_rotated(
        feat, rois, (8, 32), spatial_scale=0.25,
        sampling_ratio=0, max_sampling_ratio=4,
    )
    pair = roi_align_rotated_adaptive(
        feat, rois, (8, 32), spatial_scale=0.25,
        max_sampling_ratio=4, bulk_sampling_ratio=(2, 1), large_roi_budget=16,
    )
    # not bit-equal: XLA fuses the rotation arithmetic differently at the
    # two static sample counts (FMA), shifting coordinates by a few ULPs
    np.testing.assert_allclose(
        np.asarray(pair), np.asarray(mono), atol=1e-4, rtol=0
    )


def test_packed_bitcast_bf16_matches_unpacked(rng):
    """bf16 packed-taps gathers bit-pack bf16 pairs into f32 lanes (half
    the gathered elements); values must match the unpacked 4-gather path
    within bf16 accumulation noise, including boundary rois."""
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated

    h, w, c = 80, 100, 4
    feats = jnp.asarray(rng.randn(h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    n = 16
    rois = np.stack(
        [
            rng.uniform(-10, w + 10, n),
            rng.uniform(-10, h + 10, n),
            rng.uniform(4, 120, n),
            rng.uniform(3, 40, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)
    pooled = (8, 16)
    a = np.asarray(
        roi_align_rotated(
            feats, jnp.asarray(rois), pooled, sampling_ratio=1, packed_taps=True
        )
    ).astype(np.float32)
    b = np.asarray(
        roi_align_rotated(
            feats, jnp.asarray(rois), pooled, sampling_ratio=1, packed_taps=False
        )
    ).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)


def test_u8_crop_with_normalize_matches_f32_path(rng):
    """uint8 crop pooling with the normalization fold (one u32 word per
    C=3 tap group — half the packed-bf16 elements) must match pooling the
    f32-normalized image, including out-of-bounds zero-contribution rois
    (the weight-sum term of the fold)."""
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated

    h, w = 90, 110
    img_u8 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    mean = np.array([103.5, 116.3, 123.7], np.float32)
    std = np.array([57.4, 57.1, 58.4], np.float32)
    norm = (img_u8.astype(np.float32) - mean) / std

    n = 24
    rois = np.stack(
        [
            rng.uniform(-10, w + 10, n),   # includes out-of-bounds rois
            rng.uniform(-10, h + 10, n),
            rng.uniform(6, 140, n),
            rng.uniform(4, 50, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)
    pooled = (16, 16)

    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(img_u8), jnp.asarray(rois), pooled, sampling_ratio=1,
            normalize=(jnp.asarray(mean), jnp.asarray(std)),
        )
    )
    want = np.asarray(
        roi_align_rotated(
            jnp.asarray(norm), jnp.asarray(rois), pooled, sampling_ratio=1,
            packed_taps=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_u8_crop_adaptive_grid_matches_f32_path(rng):
    """Same parity under the adaptive sampling grid (sampling_ratio=0)."""
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated

    h, w = 64, 72
    img_u8 = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    mean = np.array([103.5, 116.3, 123.7], np.float32)
    std = np.array([57.4, 57.1, 58.4], np.float32)
    norm = (img_u8.astype(np.float32) - mean) / std
    rois = np.array(
        [[30.0, 28.0, 50.0, 20.0, 25.0], [40.0, 30.0, 90.0, 48.0, -60.0]],
        np.float32,
    )
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(img_u8), jnp.asarray(rois), (8, 8), sampling_ratio=0,
            max_sampling_ratio=2,
            normalize=(jnp.asarray(mean), jnp.asarray(std)),
        )
    )
    want = np.asarray(
        roi_align_rotated(
            jnp.asarray(norm), jnp.asarray(rois), (8, 8), sampling_ratio=0,
            max_sampling_ratio=2, packed_taps=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
