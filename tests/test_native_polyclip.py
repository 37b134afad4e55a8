"""Native polygon library: build + correctness vs python reference."""

import numpy as np
import pytest

from glass_tpu.native import load_polyclip


@pytest.fixture(scope="module")
def lib():
    lib = load_polyclip()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def quad(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float64)


def test_native_area_and_intersection(lib):
    a = quad(0, 0, 10, 10)
    b = quad(5, 0, 10, 10)
    assert abs(lib.area(a) - 100) < 1e-9
    assert abs(lib.intersection_area(a, b) - 50) < 1e-9
    # clockwise winding handled too
    assert abs(lib.intersection_area(a[::-1], b) - 50) < 1e-9


def test_native_concave_exact(lib):
    concave = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], np.float64)
    square = quad(0, 0, 5, 10)
    inter = lib.intersection_area(concave, square)
    assert abs(inter - 50.0) < 1e-9
    assert abs(lib.area(concave) - 75.0) < 1e-9


def test_native_pairwise_iou(lib):
    ps = [quad(0, 0, 10, 10), quad(100, 100, 4, 4)]
    qs = [quad(5, 0, 10, 10), quad(0, 0, 10, 10), quad(102, 100, 4, 4)]
    got = lib.pairwise_iou(ps, qs)
    assert got.shape == (2, 3)
    assert abs(got[0, 0] - 50 / 150) < 1e-9
    assert abs(got[0, 1] - 1.0) < 1e-9
    assert abs(got[1, 2] - 8 / 24) < 1e-9
    assert got[1, 0] == 0.0


def test_eval_uses_native_consistently():
    from glass_tpu.evaluation.polygon import pairwise_polygon_iou, polygon_iou

    rng = np.random.RandomState(0)
    ps = [rng.uniform(0, 50, (4, 2)) + [i * 30, 0] for i in range(3)]
    qs = [rng.uniform(0, 50, (4, 2)) + [i * 30, 0] for i in range(3)]
    # convex hulls to avoid self-intersecting quads in the python path
    import cv2

    ps = [cv2.convexHull(p.astype(np.float32)).reshape(-1, 2).astype(np.float64) for p in ps]
    qs = [cv2.convexHull(q.astype(np.float32)).reshape(-1, 2).astype(np.float64) for q in qs]
    mat = pairwise_polygon_iou(ps, qs)
    for i in range(3):
        for j in range(3):
            assert abs(mat[i, j] - polygon_iou(ps[i], qs[j])) < 1e-6
