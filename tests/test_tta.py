"""TTA runner smoke test on a tiny random-weight model."""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np

from glass_tpu.config import get_cfg
from glass_tpu.inference import GlassRunner
from glass_tpu.inference.tta import GlassRunnerWithTTA


def test_tta_merges_views():
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
    cfg.TEST.AUG.MIN_SIZES = [48, 64]
    cfg.TEST.AUG.MAX_SIZE = 96

    runner = GlassRunner(model_path=None, cfg=cfg)
    tta = GlassRunnerWithTTA(runner)
    img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype(np.uint8)
    preds = tta(img)
    assert preds.image_size == (80, 100)
    if len(preds):
        assert preds.has("pred_text_ids") or preds.has("pred_text_prob")
        assert np.isfinite(np.asarray(preds.pred_boxes)).all()

    # the eval CLI's --tta entry: input-format handling + post-processing
    # around the same multi-view merge
    preds2 = tta.eval_call(img)
    assert preds2.image_size == (80, 100)
    if len(preds2):
        assert np.isfinite(np.asarray(preds2.pred_boxes)).all()
