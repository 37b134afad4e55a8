"""Runner + post-processor integration on a tiny random-weight model."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import pytest

from glass_tpu.config import get_cfg
from glass_tpu.inference import GlassRunner
from glass_tpu.postprocess import PostProcessorRotatedBoxes
from glass_tpu.structures import Instances


def test_postprocessor_merges_overlapping_boxes():
    cfg = get_cfg()
    pp = PostProcessorRotatedBoxes(cfg)
    # Two strongly-overlapping same-height boxes above valid score -> merged.
    boxes = np.array(
        [
            [50.0, 50.0, 30.0, 10.0, 0.0],
            [60.0, 50.0, 30.0, 10.0, 0.0],
            [200.0, 200.0, 30.0, 10.0, 0.0],
        ],
        np.float32,
    )
    inst = Instances((300, 300), pred_boxes=boxes, scores=np.array([0.9, 0.8, 0.9]))
    out = pp(inst)
    assert len(out) == 2
    merged = np.asarray(out.pred_boxes)
    widths = sorted(merged[:, 2])
    # Merged box spans [35, 75] -> width 40.
    assert abs(widths[-1] - 40.0) < 1.5
    assert out.has("pred_polygons")


def test_postprocessor_filters_small_and_low_score():
    cfg = get_cfg()
    pp = PostProcessorRotatedBoxes(cfg)
    boxes = np.array(
        [
            [50.0, 50.0, 30.0, 1.0, 0.0],     # too small (h < 2)
            [150.0, 50.0, 30.0, 10.0, 0.0],   # low score
            [250.0, 50.0, 30.0, 10.0, 0.0],   # kept
        ],
        np.float32,
    )
    inst = Instances((300, 300), pred_boxes=boxes, scores=np.array([0.9, 0.1, 0.9]))
    out = pp(inst)
    assert len(out) == 1
    np.testing.assert_allclose(np.asarray(out.pred_boxes)[0, 0], 250.0)


def test_runner_end_to_end_random_weights():
    import os

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
    img = (np.random.RandomState(0).rand(120, 100, 3) * 255).astype(np.uint8)
    preds = runner(img)
    assert preds.image_size == (120, 100)
    if len(preds):
        boxes = np.asarray(preds.pred_boxes)
        assert np.isfinite(boxes).all()
        texts, scores, _ = runner.decode_texts(preds)
        assert len(texts) == len(preds)
