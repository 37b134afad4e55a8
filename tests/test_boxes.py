import numpy as np
import jax.numpy as jnp

from glass_tpu.ops import boxes as B


def test_boxes_to_polygons_axis_aligned():
    box = jnp.array([[10.0, 20.0, 8.0, 4.0, 0.0]])
    poly = np.asarray(B.boxes_to_polygons(box))[0]
    expected = np.array([[6, 18], [14, 18], [14, 22], [6, 22]], dtype=np.float32)
    np.testing.assert_allclose(poly, expected, atol=1e-5)


def test_boxes_to_polygons_rotated_90():
    # 90 deg CCW: an 8x4 box becomes visually 4 wide x 8 tall.
    box = jnp.array([[0.0, 0.0, 8.0, 4.0, 90.0]])
    poly = np.asarray(B.boxes_to_polygons(box))[0]
    xs, ys = poly[:, 0], poly[:, 1]
    np.testing.assert_allclose(xs.max() - xs.min(), 4.0, atol=1e-5)
    np.testing.assert_allclose(ys.max() - ys.min(), 8.0, atol=1e-5)


def test_rbox_box_roundtrip():
    boxes = jnp.array([[5.0, 6.0, 10.0, 4.0, 0.0]])
    aabb = np.asarray(B.rbox_to_box(boxes))
    np.testing.assert_allclose(aabb, [[0, 4, 10, 8]], atol=1e-5)
    back = np.asarray(B.box_to_rbox(jnp.asarray(aabb)))
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_delta_roundtrip():
    weights = (10.0, 10.0, 5.0, 5.0, 10.0)
    src = jnp.array([[50.0, 60.0, 20.0, 10.0, 15.0]])
    tgt = jnp.array([[55.0, 58.0, 25.0, 12.0, -30.0]])
    deltas = B.get_deltas(src, tgt, weights)
    rec = np.asarray(B.apply_deltas(deltas, src, weights))
    np.testing.assert_allclose(rec, np.asarray(tgt), rtol=1e-4, atol=1e-3)


def test_delta_angle_periodicity():
    weights = (1.0, 1.0, 1.0, 1.0, 1.0)
    src = jnp.array([[0.0, 0.0, 10.0, 10.0, 170.0]])
    tgt = jnp.array([[0.0, 0.0, 10.0, 10.0, -170.0]])
    d = np.asarray(B.get_deltas(src, tgt, weights))[0]
    # 170 -> -170 is +20 degrees through the wraparound.
    np.testing.assert_allclose(d[4], 20.0 * np.pi / 180.0, atol=1e-6)


def test_clip_only_nearly_horizontal():
    boxes = jnp.array(
        [
            [5.0, 5.0, 20.0, 20.0, 0.0],    # clipped
            [5.0, 5.0, 20.0, 20.0, 45.0],   # untouched
        ]
    )
    out = np.asarray(B.clip_rotated_boxes(boxes, (100, 100)))
    np.testing.assert_allclose(out[0], [7.5, 7.5, 15.0, 15.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(boxes)[1], atol=1e-5)


def test_overwrite_orientations():
    boxes = jnp.array([[10.0, 10.0, 8.0, 4.0, 0.0]])
    # Orientation 1 (=90 deg): delta = (0 - 1) % 4 = 3 -> swap w/h, angle +270 -> -90
    out = np.asarray(B.overwrite_orientations_on_boxes(boxes, jnp.array([1])))
    np.testing.assert_allclose(out[0], [10, 10, 4, 8, -90], atol=1e-5)
    # Orientation 0: unchanged
    out0 = np.asarray(B.overwrite_orientations_on_boxes(boxes, jnp.array([0])))
    np.testing.assert_allclose(out0[0], np.asarray(boxes)[0], atol=1e-5)


def test_scale_rotated_isotropic():
    boxes = jnp.array([[10.0, 20.0, 8.0, 4.0, 30.0]])
    out = np.asarray(B.scale_rotated_boxes(boxes, 2.0, 2.0))
    np.testing.assert_allclose(out[0], [20, 40, 16, 8, 30], atol=1e-4)


def test_vectorized_quad_intersection_matches_scalar(rng):
    """np_geometry._quad_intersection_areas_batch == the scalar
    Sutherland-Hodgman on random rotated-box pairs."""
    from glass_tpu.postprocess.np_geometry import (
        _convex_quad_intersection_area,
        _quad_intersection_areas_batch,
        boxes_to_polygons_np,
        pairwise_iou_rotated_np,
    )

    n = 40
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = rng.uniform(0, 100, n)
    boxes[:, 1] = rng.uniform(0, 100, n)
    boxes[:, 2] = rng.uniform(5, 60, n)
    boxes[:, 3] = rng.uniform(5, 30, n)
    boxes[:, 4] = rng.uniform(-180, 180, n)
    polys = boxes_to_polygons_np(boxes.astype(np.float64))

    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    batch = _quad_intersection_areas_batch(polys[ii.ravel()], polys[jj.ravel()])
    scalar = np.array([
        _convex_quad_intersection_area(polys[i], polys[j])
        for i, j in zip(ii.ravel(), jj.ravel())
    ])
    np.testing.assert_allclose(batch, scalar, atol=1e-9)

    # and the full IoU matrix (with the AABB prefilter) is self-consistent
    iou = pairwise_iou_rotated_np(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    assert (iou >= 0).all() and (iou <= 1.0 + 1e-6).all()
