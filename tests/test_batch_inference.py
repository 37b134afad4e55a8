"""Batched runner inference consistency with single-image path."""

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np

from glass_tpu.config import get_cfg
from glass_tpu.inference import GlassRunner


def test_batch_call_matches_single():
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

    runner = GlassRunner(model_path=None, cfg=cfg)
    rng = np.random.RandomState(0)
    images = [(rng.rand(100, 90, 3) * 255).astype(np.uint8) for _ in range(3)]

    singles = [runner(im) for im in images]
    batched = runner.batch_call(images, batch_size=3)
    assert len(batched) == 3
    for s, b in zip(singles, batched):
        assert len(s) == len(b)
        if len(s):
            np.testing.assert_allclose(
                np.asarray(s.pred_boxes), np.asarray(b.pred_boxes), atol=1e-3
            )
