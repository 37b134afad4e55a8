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


def test_visualize_html_standalone(tmp_path):
    """Interactive HTML visualizer (reference plotly figure equivalent):
    self-contained file with embedded image, hover polygons and tooltip
    content incl. detect/text/char scores."""
    import numpy as np

    from glass_tpu.structures.instances import Instances
    from glass_tpu.utils.visualizer import visualize_html

    img = (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8)
    inst = Instances((120, 160))
    inst.pred_polygons = np.array(
        [
            [[10.0, 10.0], [60.0, 12.0], [59.0, 30.0], [9.0, 28.0]],
            [[80.0, 50.0], [140.0, 50.0], [140.0, 70.0], [80.0, 70.0]],
        ]
    )
    inst.scores = np.array([0.91, 0.47])
    out = str(tmp_path / "vis.html")
    html = visualize_html(
        img, inst,
        texts=["hello", "<x&y>"],
        text_scores=[0.88, 0.3],
        char_scores=[[0.9, 0.8, 0.95, 0.99, 0.7], [0.5, 0.4, 0.3, 0.2, 0.1]],
        save_path=out, title="demo",
    )
    import os

    assert os.path.exists(out)
    assert html.startswith("<!DOCTYPE html>")
    assert "data:image/png;base64," in html
    assert html.count("<polygon") == 2
    assert "hello" in html
    # user text html-escaped, then attribute-escaped (tooltip renders via
    # innerHTML, so the markup must survive one entity-decode)
    assert "&amp;lt;x&amp;amp;y&amp;gt;" in html
    assert "<x&y>" not in html
    assert "Detect score: 91.0" in html
    assert "Text score: 88.0" in html
    assert "h:90" in html                   # per-char score detail
