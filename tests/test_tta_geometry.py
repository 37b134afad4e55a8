"""TTA view-merge geometry: flip-back and scale-back of rotated boxes."""

import numpy as np

from glass_tpu.postprocess.post_processor import scale_rotated_np


def test_flip_back_rotated_box():
    # A box detected in a flipped view at (x=30, angle=20) in a 100-wide view
    # maps back to x = 100-30 = 70 with negated angle.
    view_w = 100
    box = np.array([30.0, 40.0, 20.0, 10.0, 20.0])
    flipped_back = box.copy()
    flipped_back[0] = view_w - flipped_back[0]
    flipped_back[4] = -flipped_back[4]
    np.testing.assert_allclose(flipped_back, [70, 40, 20, 10, -20])


def test_scale_back_isotropic_preserves_angle():
    boxes = np.array([[50.0, 40.0, 20.0, 10.0, 35.0]])
    out = scale_rotated_np(boxes, 2.0, 2.0)
    np.testing.assert_allclose(out[0], [100, 80, 40, 20, 35], atol=1e-4)
    back = scale_rotated_np(out, 0.5, 0.5)
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_scale_back_anisotropic():
    boxes = np.array([[50.0, 40.0, 20.0, 10.0, 90.0]])
    out = scale_rotated_np(boxes, 2.0, 1.0)
    # A 90-deg box's visual height is its width: stretching x doubles the
    # box "height" axis (which lies along x) per the d2 scale convention.
    np.testing.assert_allclose(out[0, 0], 100, atol=1e-4)
    np.testing.assert_allclose(out[0, 2], 20, atol=1e-4)   # w along y: unchanged
    np.testing.assert_allclose(out[0, 3], 20, atol=1e-4)   # h along x: doubled
    np.testing.assert_allclose(abs(out[0, 4]), 90, atol=1e-3)
