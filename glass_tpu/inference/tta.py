"""Test-time augmentation for the spotting model.

Equivalent of the reference's optional ``GeneralizedRCNNWithTTA``
(``tools/eval_glass.py:14,50-65``; ``TEST.AUG``: horizontal flip +
multi-scale shortest edges 400-1200, max 4000): run detection per augmented
view, map boxes back to the original frame, merge all views with rotated
NMS, then run the recognizer/mask branches once on the merged boxes at the
primary scale (the reference's box-then-heads TTA structure).
"""

from __future__ import annotations

import logging
from typing import List

import cv2
import numpy as np

from ..postprocess.post_processor import scale_rotated_np
from ..postprocess.np_geometry import nms_rotated_np
from ..structures import Instances

logger = logging.getLogger(__name__)


class GlassRunnerWithTTA:
    def __init__(self, runner, min_sizes=None, max_size=None, flip=None):
        cfg = runner.cfg
        self.runner = runner
        self.min_sizes = list(min_sizes or cfg.TEST.AUG.MIN_SIZES)
        self.max_size = max_size or cfg.TEST.AUG.MAX_SIZE
        self.flip = cfg.TEST.AUG.FLIP if flip is None else flip
        self.nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST

    def _views(self, image: np.ndarray):
        h, w = image.shape[:2]
        for short in self.min_sizes:
            scale = short / min(h, w)
            if max(h, w) * scale > self.max_size:
                scale = self.max_size / max(h, w)
            nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
            resized = cv2.resize(image.astype(np.float32), (nw, nh))
            yield resized, scale, False
            if self.flip:
                yield resized[:, ::-1].copy(), scale, True

    def eval_call(self, original_image: np.ndarray) -> Instances:
        """Dataset-evaluation entry: same input-format handling and final
        post-processing as ``GlassRunner.eval_call``, with the multi-view
        detection merge in between (``--tta`` in ``tools/eval_glass.py``;
        reference ``Trainer.test_with_TTA``, ``eval_glass.py:50-65``)."""
        from ..utils.common import rgb2grey

        if self.runner.input_format == "RGB":
            original_image = original_image[:, :, ::-1]
        if self.runner.input_format == "GREY":
            original_image = rgb2grey(original_image, three_channels=True)
        preds = self(original_image)
        if self.runner.post_process_flag:
            preds = self.runner.post_processor(preds)
        return preds

    def __call__(self, image: np.ndarray) -> Instances:
        h, w = image.shape[:2]
        all_boxes: List[np.ndarray] = []
        all_scores: List[np.ndarray] = []
        all_orients: List[np.ndarray] = []
        for view, scale, flipped in self._views(image):
            preds = self.runner.run_on_resized(view)
            if len(preds) == 0:
                continue
            boxes = np.asarray(preds.pred_boxes).copy()
            if flipped:
                boxes[:, 0] = view.shape[1] - boxes[:, 0]
                boxes[:, 4] = -boxes[:, 4]
            boxes = scale_rotated_np(boxes, 1.0 / scale, 1.0 / scale)
            all_boxes.append(boxes)
            all_scores.append(np.asarray(preds.scores))
            all_orients.append(np.asarray(preds.orientations))

        if not all_boxes:
            return Instances((h, w), pred_boxes=np.zeros((0, 5), np.float32),
                             scores=np.zeros((0,), np.float32))
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        orients = np.concatenate(all_orients)
        keep = nms_rotated_np(boxes, scores, self.nms_thresh)
        topk = keep[: self.runner.cfg.TEST.DETECTIONS_PER_IMAGE]
        merged = Instances(
            (h, w),
            pred_boxes=boxes[topk],
            scores=scores[topk],
            orientations=orients[topk],
        )
        # Re-run recognition (+mask) on the merged boxes at the primary
        # scale using the runner's given-boxes path.
        return self.runner.forward_with_given_boxes(image, merged)
