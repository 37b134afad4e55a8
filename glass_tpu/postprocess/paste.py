"""Rotated mask pasting (host numpy).

Port of reference ``post_processor_academic.py:187-335``: paste each
predicted 28x28 mask into the full image through a rotated bilinear sampling
grid (the reference loops ``grid_sample`` per instance on GPU; here the
grid inversion is vectorized per instance on the host, and a device-side
equivalent is available through ``glass_tpu.ops.roi_align_rotated`` by
sampling the mask in the box frame)."""

from __future__ import annotations

import numpy as np
import cv2


def paste_masks_rotated(
    masks: np.ndarray,
    boxes: np.ndarray,
    image_shape,
    threshold: float = 0.5,
) -> np.ndarray:
    """masks (N, M, M) probabilities, boxes (N, 4|5) -> (N, H, W) bool."""
    img_h, img_w = image_shape
    n = len(masks)
    out = np.zeros((n, img_h, img_w), bool)
    for i in range(n):
        box = boxes[i]
        m = masks[i].astype(np.float32)
        mh, mw = m.shape
        if box.shape[-1] == 5:
            cx, cy, w, h, a = box
            # Affine map from mask pixel coords to image coords.
            t = np.deg2rad(a)
            cos_t, sin_t = np.cos(t), np.sin(t)
            # Affine map: mask (0..mw, 0..mh) spans the box extent (w, h)
            # rotated by angle a (CCW in image coords, y down).
            src_tri = np.float32([[0, 0], [mw, 0], [0, mh]])
            # Corners of the rotated box (top-left, top-right, bottom-left)
            # consistent with boxes_to_polygons' vertex order.
            def corner(dx, dy):
                # dx, dy in box frame, y down; rotate by angle a CCW (image coords)
                x = cx + dx * cos_t + dy * sin_t
                y = cy - dx * sin_t + dy * cos_t
                return [x, y]

            dst_tri = np.float32(
                [corner(-w / 2, -h / 2), corner(w / 2, -h / 2), corner(-w / 2, h / 2)]
            )
            mat = cv2.getAffineTransform(src_tri, dst_tri)
            pasted = cv2.warpAffine(m, mat, (img_w, img_h), flags=cv2.INTER_LINEAR)
        else:
            x0, y0, x1, y1 = box
            bw = max(int(round(x1 - x0)), 1)
            bh = max(int(round(y1 - y0)), 1)
            resized = cv2.resize(m, (bw, bh), interpolation=cv2.INTER_LINEAR)
            pasted = np.zeros((img_h, img_w), np.float32)
            ix0, iy0 = max(int(x0), 0), max(int(y0), 0)
            ix1, iy1 = min(int(x0) + bw, img_w), min(int(y0) + bh, img_h)
            pasted[iy0:iy1, ix0:ix1] = resized[: iy1 - iy0, : ix1 - ix0]
        out[i] = pasted >= threshold
    return out
