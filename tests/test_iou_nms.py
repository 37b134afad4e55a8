import numpy as np
import jax.numpy as jnp

from glass_tpu.ops import (
    pairwise_iou_rotated,
    pairwise_ioa_rotated,
    nms_rotated_mask,
    batched_nms_rotated_mask,
)


def _np_rect_iou_axis_aligned(b1, b2):
    # numpy reference for angle-0 boxes via interval intersection
    def to_xyxy(b):
        cx, cy, w, h, _ = b
        return cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2

    ax0, ay0, ax1, ay1 = to_xyxy(b1)
    bx0, by0, bx1, by1 = to_xyxy(b2)
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return inter / union if union > 0 else 0.0


def test_iou_axis_aligned_matches_numpy(rng):
    boxes1 = np.stack(
        [
            rng.uniform(20, 80, 12),
            rng.uniform(20, 80, 12),
            rng.uniform(5, 30, 12),
            rng.uniform(5, 30, 12),
            np.zeros(12),
        ],
        axis=1,
    ).astype(np.float32)
    boxes2 = boxes1.copy()
    rng.shuffle(boxes2)
    got = np.asarray(pairwise_iou_rotated(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    for i in range(len(boxes1)):
        for j in range(len(boxes2)):
            ref = _np_rect_iou_axis_aligned(boxes1[i], boxes2[j])
            assert abs(got[i, j] - ref) < 1e-4, (i, j, got[i, j], ref)


def test_iou_identical_is_one():
    b = jnp.array([[50.0, 50.0, 20.0, 10.0, 33.0]])
    iou = np.asarray(pairwise_iou_rotated(b, b))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)


def test_iou_rotation_invariance():
    # Two boxes rotated together by the same angle keep their IoU.
    base1 = np.array([50.0, 50.0, 20.0, 10.0, 0.0], np.float32)
    base2 = np.array([55.0, 52.0, 18.0, 12.0, 0.0], np.float32)
    ref = np.asarray(
        pairwise_iou_rotated(jnp.asarray([base1]), jnp.asarray([base2]))
    )[0, 0]
    for extra in (17.0, 45.0, 90.0, 133.0):
        r1, r2 = base1.copy(), base2.copy()
        # Rotate centers around (50, 50) and add the angle.
        for r in (r1, r2):
            dx, dy = r[0] - 50, r[1] - 50
            t = np.deg2rad(extra)
            # XYWHA angle is CCW in image coords (y down): x' = c*dx + s*dy
            r[0] = 50 + np.cos(t) * dx + np.sin(t) * dy
            r[1] = 50 - np.sin(t) * dx + np.cos(t) * dy
            r[4] += extra
        got = np.asarray(
            pairwise_iou_rotated(jnp.asarray([r1]), jnp.asarray([r2]))
        )[0, 0]
        assert abs(got - ref) < 1e-3, (extra, got, ref)


def test_iou_45deg_diamond():
    # Unit square vs same square rotated 45 deg: known IoU = 2*(sqrt2-1)/(2-(sqrt2-1))
    a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0, 45.0]])
    got = float(np.asarray(pairwise_iou_rotated(a, b))[0, 0])
    inter = 4 * (np.sqrt(2.0) - 1.0) ** 2 / 2 * 2  # octagon area = 2(sqrt2-1)... compute directly
    # Octagon intersection area for unit squares at 45deg: 2*(sqrt(2)-1)
    inter = 2 * (np.sqrt(2.0) - 1.0)
    ref = inter / (2.0 - inter)
    assert abs(got - ref) < 1e-4, (got, ref)


def test_ioa_contained_box():
    big = jnp.array([[50.0, 50.0, 40.0, 40.0, 10.0]])
    small = jnp.array([[50.0, 50.0, 10.0, 10.0, 10.0]])
    ioa = np.asarray(pairwise_ioa_rotated(big, small))
    np.testing.assert_allclose(ioa, [[1.0]], atol=1e-3)


def test_nms_basic():
    boxes = jnp.array(
        [
            [50.0, 50.0, 20.0, 10.0, 0.0],
            [51.0, 50.0, 20.0, 10.0, 0.0],   # overlaps first
            [200.0, 200.0, 20.0, 10.0, 0.0],  # far away
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated_mask(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_respects_valid_and_topk():
    boxes = jnp.tile(jnp.array([[50.0, 50.0, 20.0, 10.0, 0.0]]), (4, 1))
    boxes = boxes.at[:, 0].add(jnp.array([0.0, 100.0, 200.0, 300.0]))
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    valid = jnp.array([True, True, True, False])
    keep = np.asarray(nms_rotated_mask(boxes, scores, 0.5, valid=valid, max_keep=2))
    np.testing.assert_array_equal(keep, [True, True, False, False])


def test_nms_fixpoint_matches_sequential_greedy(rng):
    n = 64
    boxes = np.stack(
        [
            rng.uniform(0, 200, n),
            rng.uniform(0, 200, n),
            rng.uniform(10, 60, n),
            rng.uniform(10, 40, n),
            rng.uniform(-90, 90, n),
        ],
        axis=1,
    ).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    got = np.asarray(nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.3))

    # numpy sequential greedy reference using the same IoU kernel
    iou = np.asarray(pairwise_iou_rotated(jnp.asarray(boxes), jnp.asarray(boxes)))
    order = np.argsort(-scores)
    suppressed = np.zeros(n, bool)
    keep_ref = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep_ref[i] = True
        for j in order:
            if scores[j] < scores[i] and iou[i, j] > 0.3:
                suppressed[j] = True
    np.testing.assert_array_equal(got, keep_ref)


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array(
        [
            [50.0, 50.0, 20.0, 10.0, 0.0],
            [50.0, 50.0, 20.0, 10.0, 0.0],
        ]
    )
    scores = jnp.array([0.9, 0.8])
    idxs = jnp.array([0, 1])
    keep = np.asarray(batched_nms_rotated_mask(boxes, scores, idxs, 0.5))
    np.testing.assert_array_equal(keep, [True, True])


def test_exact_top_k_matches_flat():
    """Row-split exact top-k (models.rpn.exact_top_k) == lax.top_k, values
    and tie-order identical, across sizes spanning the rows>1 and rows=1
    paths and with repeated values."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.models.rpn import exact_top_k

    rng = np.random.RandomState(7)
    for n, k in [(706560, 1000), (176640, 1000), (11040, 1000), (300, 100)]:
        x = rng.randn(n).astype(np.float32)
        # inject ties to exercise tie-order equivalence
        x[rng.randint(0, n, size=n // 10)] = 1.5
        xj = jnp.asarray(x)
        fv, fi = jax.lax.top_k(xj, k)
        hv, hi = exact_top_k(xj, k)
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(hv))
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(hi))
