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
