"""tools/demo.py end-to-end (random weights, tiny shapes)."""

import pytest

pytestmark = pytest.mark.slow

import os
import sys

import numpy as np
import cv2


def test_demo_cli(tmp_path, monkeypatch):
    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, (np.random.RandomState(0).rand(90, 110, 3) * 255).astype(np.uint8))
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "glass_finetune_icdar15.yaml"
    )
    out_png = str(tmp_path / "vis.png")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--image", img_path, "--config", cfg_path, "--output", out_png,
        "INPUT.MIN_SIZE_TEST", "64", "INPUT.MAX_SIZE_TEST", "96",
        "TPU.IMAGE_BUCKETS", "[[96, 128]]",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "16",
        "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "4",
    ])
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib

    demo = importlib.import_module("demo")
    demo.main()
    assert os.path.exists(out_png)
