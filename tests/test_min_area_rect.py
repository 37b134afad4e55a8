import numpy as np
import jax.numpy as jnp
import cv2

from glass_tpu.ops import min_area_rect, polygons_to_rotated_boxes
from glass_tpu.ops.boxes import boxes_to_polygons


def _rect_area(res):
    return float(res[2] * res[3])


def test_min_area_rect_matches_cv2(rng):
    for _ in range(10):
        pts = rng.uniform(0, 100, size=(8, 2)).astype(np.float32)
        (ccx, ccy), (cw, ch), _ = cv2.minAreaRect(pts)
        got = min_area_rect(jnp.asarray(pts))
        got = [float(x) for x in got]
        # Same enclosing area and center (rect orientation convention may differ).
        assert abs(got[2] * got[3] - cw * ch) < 1e-2 * max(1.0, cw * ch)
        assert abs(got[0] - ccx) < 0.5 and abs(got[1] - ccy) < 0.5


def test_min_area_rect_recovers_rotated_box():
    box = jnp.array([[50.0, 40.0, 30.0, 10.0, 25.0]])
    poly = boxes_to_polygons(box)[0]
    cx, cy, w, h, a = [float(x) for x in min_area_rect(poly)]
    assert abs(cx - 50) < 1e-3 and abs(cy - 40) < 1e-3
    dims = sorted([w, h])
    assert abs(dims[0] - 10) < 1e-3 and abs(dims[1] - 30) < 1e-3


def test_polygons_to_rotated_boxes_orientation():
    box = jnp.array([[50.0, 40.0, 30.0, 10.0, 25.0]])
    poly = boxes_to_polygons(box)  # (1, 4, 2)
    out = np.asarray(
        polygons_to_rotated_boxes(poly, orientations=jnp.array([25.0]))
    )[0]
    np.testing.assert_allclose(out, [50, 40, 30, 10, 25], atol=1e-2)
    # Requesting the perpendicular orientation swaps w/h and shifts angle 90.
    out90 = np.asarray(
        polygons_to_rotated_boxes(poly, orientations=jnp.array([115.0]))
    )[0]
    np.testing.assert_allclose(out90, [50, 40, 10, 30, 115], atol=1e-2)
