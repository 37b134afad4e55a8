"""Two-stage (word-bucketed) inference matches the single-jit path."""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np

from glass_tpu.config import get_cfg
from glass_tpu.inference import GlassRunner


def _cfg():
    cfg = get_cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs", "glass_finetune_icdar15.yaml")
    )
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.TPU.IMAGE_BUCKETS = [[96, 96]]
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 4
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TPU.WORD_BUCKETS = [2, 4]
    return cfg


def test_two_stage_matches_single_stage():
    img = (np.random.RandomState(0).rand(90, 90, 3) * 255).astype(np.uint8)

    cfg1 = _cfg()
    r1 = GlassRunner(model_path=None, cfg=cfg1)
    single = r1.run_on_resized(img.astype(np.float32))

    cfg2 = _cfg()
    cfg2.TPU.TWO_STAGE_INFERENCE = True
    r2 = GlassRunner(model_path=None, cfg=cfg2, params=r1.params)
    two = r2.run_on_resized(img.astype(np.float32))

    assert len(single) == len(two)
    if len(single):
        np.testing.assert_allclose(
            np.asarray(single.pred_boxes), np.asarray(two.pred_boxes), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(single.pred_text_step_scores),
            np.asarray(two.pred_text_step_scores),
            atol=2e-3,
        )
        # argmax ids may legitimately differ only where two classes are
        # within the bf16 tolerance; with random weights they agree.
        np.testing.assert_array_equal(
            np.asarray(single.pred_text_ids), np.asarray(two.pred_text_ids)
        )
