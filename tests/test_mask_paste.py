import numpy as np

from glass_tpu.postprocess.paste import paste_masks_rotated


def test_paste_axis_aligned_box():
    mask = np.zeros((28, 28), np.float32)
    mask[7:21, 7:21] = 1.0  # center half
    boxes = np.array([[50.0, 40.0, 28.0, 28.0, 0.0]], np.float32)
    out = paste_masks_rotated(mask[None], boxes, (80, 100))
    assert out.shape == (1, 80, 100)
    ys, xs = np.where(out[0])
    # center half of a 28x28 box at (50, 40): spans ~[43,57] x [33,47]
    assert 40 < xs.min() < 46 and 54 < xs.max() < 60
    assert 30 < ys.min() < 36 and 44 < ys.max() < 50


def test_paste_rotated_90_box():
    mask = np.zeros((28, 28), np.float32)
    mask[:, :14] = 1.0  # left half of the box frame
    # 40x20 box rotated 90 deg: in image coords appears 20 wide, 40 tall.
    boxes = np.array([[50.0, 50.0, 40.0, 20.0, 90.0]], np.float32)
    out = paste_masks_rotated(mask[None], boxes, (100, 100))
    ys, xs = np.where(out[0])
    # The lit left-half of the box frame is 20 (box height) wide and
    # 20 (half the box width) long; after +90 CCW it lands on the +y side.
    assert 15 < xs.max() - xs.min() < 25
    assert 15 < ys.max() - ys.min() < 25
    assert np.mean(ys) > 55
    assert abs(np.mean(xs) - 50) < 3


def test_windowed_polygons_match_full_paste():
    """rotated_masks_to_polygons == contour(paste_masks_rotated) for every
    box (windowing is exact: masks are zero outside the box AABB)."""
    import cv2

    from glass_tpu.postprocess.paste import rotated_masks_to_polygons

    rng = np.random.RandomState(0)
    n = 12
    masks = rng.rand(n, 28, 28).astype(np.float32)
    # smooth them a bit so contours are non-degenerate
    for i in range(n):
        masks[i] = cv2.GaussianBlur(masks[i], (5, 5), 2)
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = rng.uniform(60, 580, n)
    boxes[:, 1] = rng.uniform(60, 420, n)
    boxes[:, 2] = rng.uniform(30, 120, n)
    boxes[:, 3] = rng.uniform(12, 40, n)
    boxes[:, 4] = rng.uniform(-90, 90, n)

    shape = (480, 640)
    full = paste_masks_rotated(masks, boxes, shape)
    windowed = rotated_masks_to_polygons(masks, boxes, shape)

    for i in range(n):
        contours, _ = cv2.findContours(
            full[i].astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        if not contours:
            assert windowed[i] is None
            continue
        largest = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
        assert windowed[i] is not None
        # identical contours (same pixels -> same polygon up to start point)
        assert len(windowed[i]) == len(largest), i
        # compare as sets of vertices
        a = {tuple(p) for p in windowed[i]}
        b = {tuple(p) for p in largest}
        assert a == b, i
