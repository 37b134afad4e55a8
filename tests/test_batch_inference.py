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


def test_eval_batch_call_pipelined_uint8():
    """eval_batch_call (uint8 transfer, software-pipelined dispatch/collect)
    returns one post-processed Instances per input, stable across batch
    sizes, and carries the on-device-argmax text fields."""
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
    # keep everything so text fields are populated
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.POST_PROCESSING.TEXT_THRESHOLD = 0.0
    cfg.POST_PROCESSING.DETECT_THRESHOLD = 0.0
    cfg.POST_PROCESSING.VALID_CONFIDENCE = 0.0

    runner = GlassRunner(model_path=None, cfg=cfg)
    rng = np.random.RandomState(1)
    images = [(rng.rand(90, 100, 3) * 255).astype(np.uint8) for _ in range(4)]

    out_b2 = runner.eval_batch_call(images, batch_size=2)
    out_again = runner.eval_batch_call(images, batch_size=2)
    out_b5 = runner.eval_batch_call(images, batch_size=4)
    assert len(out_b2) == len(out_again) == len(out_b5) == 4
    # Deterministic: the pipelined path returns identical results per image
    # across runs (batch-size changes can flip near-tied NMS/merge decisions
    # under random weights, so cross-batch-size equality is not asserted).
    for a, b in zip(out_b2, out_again):
        assert len(a) == len(b)
        if len(a):
            np.testing.assert_array_equal(
                np.asarray(a.pred_boxes), np.asarray(b.pred_boxes)
            )
    for r in out_b2 + out_b5:
        assert r is not None
        if len(r):
            assert r.has("pred_text_ids") and r.has("pred_text_step_scores")
            assert np.isfinite(np.asarray(r.pred_boxes)).all()
