"""Independent golden-vector tests for the three core rotated-geometry
kernels (VERDICT r2 next-round #1a: break the torch-mirror circularity).

None of these tests import ``tests/torch_mirror.py`` or any repo host
implementation.  The oracles are:

* **Closed-form analytic cases** with the derivation in comments.  Several
  correspond to detectron2's published unit-test expectations for
  ``pairwise_iou_rotated`` (d2 ``tests/structures/test_rotated_boxes.py``:
  the 0.5 half-overlap case, the 45-degree 0.7071 case, the 0.83
  precision case) — transcribed as *math*, re-derived here.
* **OpenCV** (``cv2.rotatedRectangleIntersection`` + ``contourArea``) — a
  third-party exact rotated-rectangle clipping implementation.  Angle
  convention note: d2 angles are CCW; cv2's are the mirror convention, but
  mirroring both boxes of a pair preserves intersection/union areas, so
  feeding the angles unchanged yields identical IoU values.
* A **numpy transcription of the published ROIAlignRotated kernel spec**
  (detectron2 ``layers/csrc/ROIAlignRotated/ROIAlignRotated_cpu.cpp``:
  aligned half-pixel offset, center-relative sample grid rotated by
  ``angle*pi/180`` via ``y = yy*cos - xx*sin + cy; x = yy*sin + xx*cos +
  cx``, taps outside [-1, H]x[-1, W] contribute zero, in-range taps clamp)
  written independently of the repo's gather-based layout.
* An independently-written axis-aligned greedy NMS (the standard
  algorithm), mirroring d2's own ``test_nms_rotated`` strategy of checking
  ``nms_rotated`` at angle 0 against plain horizontal-box NMS.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glass_tpu.ops.iou_rotated import (
    pairwise_ioa_rotated,
    pairwise_iou_rotated,
)
from glass_tpu.ops.nms_rotated import nms_rotated_mask
from glass_tpu.ops.roi_align_rotated import roi_align_rotated


# ---------------------------------------------------------------------------
# pairwise_iou_rotated
# ---------------------------------------------------------------------------


def test_iou_golden_analytic_cases():
    cases = [
        # (box1, box2, expected, why)
        # d2 test_iou_half_overlap: right half of the unit square.
        ([0.5, 0.5, 1.0, 1.0, 0.0], [0.25, 0.5, 0.5, 1.0, 0.0], 0.5,
         "inter=0.5, union=1.0"),
        # d2 test_iou_45_degrees: unit square vs itself rotated 45 deg about
        # its center. inter = 2*(sqrt(2)-1) (regular octagon), union =
        # 2 - inter, IoU = sqrt(2)/2.
        ([0.5, 0.5, 1.0, 1.0, 45.0], [0.5, 0.5, 1.0, 1.0, 0.0],
         np.sqrt(2) / 2, "octagon overlap"),
        # d2 test_iou_precision: large-coordinate concentric boxes; the
        # shorter box is contained, IoU = 8.3/10 exactly.
        ([565.0, 565.0, 10.0, 10.0, 0.0], [565.0, 565.0, 10.0, 8.3, 0.0],
         0.83, "containment at offset 565"),
        # identical rotated boxes
        ([10.0, 7.0, 6.0, 3.0, 37.0], [10.0, 7.0, 6.0, 3.0, 37.0], 1.0,
         "identity"),
        # w x h vs h x w about the same center (90-deg rotation of a non-
        # square): inter = min(w,h)^2 = 4, union = 2wh - 4 = 12, IoU = 1/3.
        ([0.0, 0.0, 4.0, 2.0, 0.0], [0.0, 0.0, 4.0, 2.0, 90.0], 1.0 / 3.0,
         "perpendicular rectangles"),
        # full 360-degree rotation = identity
        ([3.0, 4.0, 5.0, 2.0, 360.0], [3.0, 4.0, 5.0, 2.0, 0.0], 1.0,
         "360 == 0"),
        # disjoint
        ([0.0, 0.0, 2.0, 2.0, 30.0], [10.0, 10.0, 2.0, 2.0, -60.0], 0.0,
         "disjoint"),
        # same-angle concentric 2x2 inside 4x2: inter = 4, union = 8.
        ([0.0, 0.0, 2.0, 2.0, 45.0], [0.0, 0.0, 4.0, 2.0, 45.0], 0.5,
         "same-angle containment"),
    ]

    b1 = jnp.asarray([c[0] for c in cases], jnp.float32)
    b2 = jnp.asarray([c[1] for c in cases], jnp.float32)
    got = np.diag(np.asarray(pairwise_iou_rotated(b1, b2)))
    want = np.array([c[2] for c in cases])
    np.testing.assert_allclose(got, want, atol=2e-4)


def _spec_corners(box):
    """Box corners from the published kernel-spec rotation (the same
    ``y = yy*cos - xx*sin + cy; x = yy*sin + xx*cos + cx`` map the
    ROIAlignRotated spec tests below validate independently)."""
    cx, cy, w, h, a = [float(v) for v in box]
    th = np.deg2rad(a)
    c, s = np.cos(th), np.sin(th)
    pts = []
    for yy, xx in [(-h / 2, -w / 2), (-h / 2, w / 2), (h / 2, w / 2),
                   (h / 2, -w / 2)]:
        pts.append([yy * s + xx * c + cx, yy * c - xx * s + cy])
    return np.array(pts, np.float32)


def _cv2_iou(box1, box2):
    """OpenCV convex-polygon clipping as the independent oracle.

    ``cv2.rotatedRectangleIntersection`` is not used directly because
    OpenCV's RotatedRect angle convention mirrors d2's — instead the
    corners are generated from the d2 kernel-spec rotation and clipped
    with the generic ``intersectConvexConvex``."""
    import cv2

    inter, _ = cv2.intersectConvexConvex(_spec_corners(box1),
                                         _spec_corners(box2))
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    return inter / max(a1 + a2 - inter, 1e-12), inter


def _random_boxes(rng, n, scale=100.0):
    return np.stack(
        [
            rng.uniform(0, scale, n),
            rng.uniform(0, scale, n),
            rng.uniform(2, scale / 2, n),
            rng.uniform(2, scale / 2, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_iou_vs_opencv_randomized():
    rng = np.random.RandomState(7)
    b1 = _random_boxes(rng, 64)
    b2 = _random_boxes(rng, 48)
    got = np.asarray(pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    assert got.shape == (64, 48)
    # spot-check every pair against OpenCV's clipping
    want = np.zeros_like(got)
    for i in range(64):
        for j in range(48):
            want[i, j], _ = _cv2_iou(b1[i], b2[j])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_iou_vs_opencv_large_coordinates():
    """f32 stability at detection-typical magnitudes (the kernel recenters
    per pair; cv2 runs in f64)."""
    rng = np.random.RandomState(11)
    b1 = _random_boxes(rng, 32, scale=1200.0)
    b2 = b1 + rng.uniform(-8, 8, b1.shape).astype(np.float32)
    b2[:, 2:4] = np.abs(b2[:, 2:4]) + 2
    got = np.diag(
        np.asarray(pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    )
    want = np.array([_cv2_iou(b1[i], b2[i])[0] for i in range(32)])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_ioa_vs_opencv():
    """IoA = intersection / min(area1, area2) — the reference's algebraic
    identity (glass/structures/boxes.py:23-48) checked against the
    independently-clipped intersection."""
    rng = np.random.RandomState(3)
    b1 = _random_boxes(rng, 16)
    b2 = _random_boxes(rng, 16)
    got = np.asarray(pairwise_ioa_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(16):
        for j in range(16):
            _, inter = _cv2_iou(b1[i], b2[j])
            want = inter / min(b1[i, 2] * b1[i, 3], b2[j, 2] * b2[j, 3])
            assert abs(got[i, j] - want) < 2e-3, (i, j, got[i, j], want)


# ---------------------------------------------------------------------------
# nms_rotated
# ---------------------------------------------------------------------------


def _aabb_greedy_nms(boxes_xyxy, scores, thresh):
    """Independent textbook axis-aligned greedy NMS (numpy)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1, y1, x2, y2 = boxes_xyxy[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(x1, boxes_xyxy[j, 0])
            yy1 = max(y1, boxes_xyxy[j, 1])
            xx2 = min(x2, boxes_xyxy[j, 2])
            yy2 = min(y2, boxes_xyxy[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a_i = (x2 - x1) * (y2 - y1)
            a_j = (boxes_xyxy[j, 2] - boxes_xyxy[j, 0]) * (
                boxes_xyxy[j, 3] - boxes_xyxy[j, 1]
            )
            if inter / (a_i + a_j - inter) > thresh:
                suppressed[j] = True
    return sorted(keep)


def test_nms_angle0_matches_independent_aabb_nms():
    """d2's published nms_rotated test strategy: at angle 0 the rotated NMS
    must agree with plain horizontal-box NMS."""
    rng = np.random.RandomState(5)
    n = 200
    cx = rng.uniform(20, 200, n)
    cy = rng.uniform(20, 200, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    scores = rng.rand(n).astype(np.float32)
    rboxes = np.stack([cx, cy, w, h, np.zeros(n)], 1).astype(np.float32)
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)

    for thresh in (0.3, 0.5, 0.7):
        keep_mask = np.asarray(
            nms_rotated_mask(jnp.asarray(rboxes), jnp.asarray(scores), thresh)
        )
        got = sorted(np.nonzero(keep_mask)[0].tolist())
        want = _aabb_greedy_nms(xyxy, scores, thresh)
        assert got == want, f"thresh={thresh}"


def test_nms_rotated_vs_opencv_greedy():
    """Full rotated case: greedy suppression driven by OpenCV IoU."""
    rng = np.random.RandomState(9)
    n = 120
    boxes = _random_boxes(rng, n, scale=150.0)
    scores = rng.rand(n).astype(np.float32)
    thresh = 0.4

    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(n, bool)
    want = []
    for i in order:
        if suppressed[i]:
            continue
        want.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            iou, _ = _cv2_iou(boxes[i], boxes[j])
            if iou > thresh:
                suppressed[j] = True
    keep_mask = np.asarray(
        nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh)
    )
    got = sorted(np.nonzero(keep_mask)[0].tolist())
    # Pairs with IoU within f32 tolerance of the threshold may flip the
    # greedy cascade; with these seeds none sit on the boundary.
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# ROIAlignRotated
# ---------------------------------------------------------------------------


def _spec_roi_align_rotated(
    feat_hwc, rois, out_hw, spatial_scale, sampling_ratio, aligned=True
):
    """Numpy transcription of the published ROIAlignRotated kernel spec
    (d2 ROIAlignRotated_cpu.cpp): per-bin sample grid in the roi frame,
    rotated about the roi center, bilinear with the -1/H boundary rule."""
    H, W, C = feat_hwc.shape
    ph_n, pw_n = out_hw
    offset = 0.5 if aligned else 0.0
    out = np.zeros((len(rois), ph_n, pw_n, C), np.float64)
    for r, roi in enumerate(rois):
        cx = roi[0] * spatial_scale - offset
        cy = roi[1] * spatial_scale - offset
        rw = max(roi[2] * spatial_scale, 1e-10 if aligned else 1.0)
        rh = max(roi[3] * spatial_scale, 1e-10 if aligned else 1.0)
        theta = roi[4] * np.pi / 180.0
        cos_t, sin_t = np.cos(theta), np.sin(theta)
        bin_h = rh / ph_n
        bin_w = rw / pw_n
        g_h = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / ph_n))
        g_w = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / pw_n))
        start_h, start_w = -rh / 2.0, -rw / 2.0
        for ph in range(ph_n):
            for pw in range(pw_n):
                acc = np.zeros(C, np.float64)
                for iy in range(g_h):
                    yy = start_h + ph * bin_h + (iy + 0.5) * bin_h / g_h
                    for ix in range(g_w):
                        xx = start_w + pw * bin_w + (ix + 0.5) * bin_w / g_w
                        y = yy * cos_t - xx * sin_t + cy
                        x = yy * sin_t + xx * cos_t + cx
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y_c = min(max(y, 0.0), H - 1)
                        x_c = min(max(x, 0.0), W - 1)
                        y0, x0 = int(y_c), int(x_c)
                        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y_c - y0, x_c - x0
                        acc += (
                            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
                            + feat_hwc[y0, x1] * (1 - ly) * lx
                            + feat_hwc[y1, x0] * ly * (1 - lx)
                            + feat_hwc[y1, x1] * ly * lx
                        )
                out[r, ph, pw] = acc / (g_h * g_w)
    return out


@pytest.mark.parametrize("sampling_ratio", [1, 2])
def test_roi_align_rotated_matches_kernel_spec(sampling_ratio):
    rng = np.random.RandomState(2)
    feat = rng.randn(24, 32, 5).astype(np.float32)
    rois = np.array(
        [
            [16.0, 12.0, 14.0, 8.0, 0.0],
            [16.0, 12.0, 14.0, 8.0, 33.0],
            [10.0, 18.0, 20.0, 6.0, -75.0],
            [30.0, 4.0, 9.0, 9.0, 120.0],   # partially out of bounds
            [2.0, 2.0, 6.0, 6.0, 45.0],     # corner, clamped taps
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(feat), jnp.asarray(rois), (7, 7),
            spatial_scale=1.0, sampling_ratio=sampling_ratio,
        )
    )
    want = _spec_roi_align_rotated(feat, rois, (7, 7), 1.0, sampling_ratio)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_rotated_spec_with_stride_and_dynamic_grid():
    """spatial_scale=0.25 (P2-like) and sampling_ratio=0 (grid from
    ceil(roi/bin), the d2 dynamic rule realised statically in the repo)."""
    rng = np.random.RandomState(4)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    rois = np.array(
        [
            [30.0, 30.0, 40.0, 24.0, 20.0],
            [28.0, 36.0, 56.0, 16.0, -10.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(feat), jnp.asarray(rois), (4, 4),
            spatial_scale=0.25, sampling_ratio=0, max_sampling_ratio=4,
        )
    )
    want = _spec_roi_align_rotated(feat, rois, (4, 4), 0.25, 0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_rotated_linear_ramp_closed_form():
    """Bilinear interpolation reproduces affine functions exactly, so on
    f(x, y) = 3x + 2y + 1 every pooled bin equals f at the bin's mean
    sample point — computable in closed form from the grid definition."""
    H, W = 32, 32
    ys, xs = np.mgrid[0:H, 0:W]
    feat = (3.0 * xs + 2.0 * ys + 1.0)[..., None].astype(np.float32)
    cx, cy, w, h, a = 15.0, 14.0, 12.0, 6.0, 25.0
    rois = np.array([[cx, cy, w, h, a]], np.float32)
    ph_n = pw_n = 4
    sr = 2
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(feat), jnp.asarray(rois), (ph_n, pw_n),
            spatial_scale=1.0, sampling_ratio=sr,
        )
    )[0, ..., 0]

    theta = np.deg2rad(a)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    bin_h, bin_w = h / ph_n, w / pw_n
    for ph in range(ph_n):
        for pw in range(pw_n):
            # mean of the 2x2 sample offsets = bin center
            yy = -h / 2 + (ph + 0.5) * bin_h
            xx = -w / 2 + (pw + 0.5) * bin_w
            y = yy * cos_t - xx * sin_t + (cy - 0.5)
            x = yy * sin_t + xx * cos_t + (cx - 0.5)
            want = 3.0 * x + 2.0 * y + 1.0
            assert abs(got[ph, pw] - want) < 1e-3, (ph, pw)


def test_roi_align_rotated_rot90_equivariance():
    """Pooling a 90-deg-rotated image with the correspondingly rotated roi
    returns the same tensor (d2's rotation-consistency property)."""
    rng = np.random.RandomState(8)
    H = W = 20
    feat = rng.randn(H, W, 2).astype(np.float32)
    roi = np.array([[9.2, 11.0, 10.0, 5.0, 17.0]], np.float32)
    base = np.asarray(
        roi_align_rotated(
            jnp.asarray(feat), jnp.asarray(roi), (5, 5),
            spatial_scale=1.0, sampling_ratio=2,
        )
    )
    # Rotate the image a quarter turn: new[x, H-1-y] = old[y, x], i.e. the
    # continuous pixel map (x, y) -> (x', y') = (H-1-y, x).  Under the
    # kernel's sample-point formula (y = yy*cos - xx*sin + cy; x = yy*sin +
    # xx*cos + cx) the roi that pools the same content in the new frame has
    # center mapped by the same point map and angle theta - 90:
    #   sin(t-90) = -cos t, cos(t-90) = sin t gives
    #   x' = -(y - cy) + cx' = H-1-y  and  y' = (x - cx) + cy' = x.
    rot = np.transpose(feat, (1, 0, 2))[:, ::-1]  # new[x, H-1-y] = old[y, x]
    cx, cy = roi[0, 0] - 0.5, roi[0, 1] - 0.5
    ncx, ncy = (H - 1) - cy, cx
    nroi = np.array([[ncx + 0.5, ncy + 0.5, roi[0, 2], roi[0, 3],
                      roi[0, 4] - 90.0]], np.float32)
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(np.ascontiguousarray(rot)), jnp.asarray(nroi), (5, 5),
            spatial_scale=1.0, sampling_ratio=2,
        )
    )
    np.testing.assert_allclose(got, base, atol=1e-4)


def test_roi_align_rotated_vs_opencv_warp_affine():
    """Third-party oracle: at sampling_ratio=1 each output pixel of
    ROIAlignRotated is one bilinear tap at the rotated bin center, which is
    exactly cv2.warpAffine with WARP_INVERSE_MAP and the affine that maps
    output pixel (j, i) to center + R(theta) . (xx(j), yy(i)) (the aligned
    -0.5 offset included).  Rois are kept interior so d2's clamp-at-border
    rule and cv2's BORDER_CONSTANT never diverge."""
    import cv2

    rng = np.random.RandomState(11)
    img = rng.rand(96, 128, 3).astype(np.float32)
    rois = np.array(
        [
            [64.0, 48.0, 60.0, 24.0, 0.0],
            [64.0, 48.0, 50.0, 20.0, 30.0],
            [70.0, 40.0, 44.0, 30.0, -58.0],
            [60.0, 50.0, 36.0, 36.0, 120.0],
        ],
        np.float32,
    )
    out_h, out_w = 24, 40
    got = np.asarray(
        roi_align_rotated(
            jnp.asarray(img), jnp.asarray(rois), (out_h, out_w),
            spatial_scale=1.0, sampling_ratio=1,
        )
    )
    for r, (cx, cy, rw, rh, ang) in enumerate(rois):
        cx, cy = cx - 0.5, cy - 0.5  # aligned=True half-pixel offset
        t = np.deg2rad(ang)
        c, s = np.cos(t), np.sin(t)
        bw, bh = rw / out_w, rh / out_h
        tx = c * (-rw / 2 + 0.5 * bw) + s * (-rh / 2 + 0.5 * bh) + cx
        ty = -s * (-rw / 2 + 0.5 * bw) + c * (-rh / 2 + 0.5 * bh) + cy
        M = np.array([[c * bw, s * bh, tx], [-s * bw, c * bh, ty]], np.float64)
        want = cv2.warpAffine(
            img, M, (out_w, out_h),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
        )
        np.testing.assert_allclose(got[r], want, atol=2e-3)
