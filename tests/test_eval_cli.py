"""tools/eval_glass.py end-to-end on a synthetic dataset (random weights)."""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import sys

import numpy as np
import cv2
import pytest


def _make_dataset(tmp_path):
    root = tmp_path / "ds"
    (root / "toy_test").mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        h, w = 100, 120
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "toy_test" / f"img_{i}.png"), img)
        images.append({"id": i + 1, "file_name": f"img_{i}.png", "height": h, "width": w})
        quad = [[20, 20], [60, 20], [60, 40], [20, 40]]
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [20, 20, 40, 20], "rotated_box": quad,
            "segmentation": [[c for pt in quad for c in pt]],
            "rec": "word", "angle": 0, "orientation": 0,
            "area": 800, "iscrowd": 0,
        })
    with open(root / "toy_test" / "annotations.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "word"}]}, f)
    ds_yaml = tmp_path / "datasets.yaml"
    ds_yaml.write_text(f"ROOT: {root}\nDATASETS: []\nVAL_DATASETS:\n  - toy_test\n")
    return str(ds_yaml)


def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    ds_yaml = _make_dataset(tmp_path)
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "glass_finetune_icdar15.yaml"
    )
    out_dir = str(tmp_path / "out")
    argv = [
        "eval_glass.py",
        "--config", cfg_path,
        "--datasets", ds_yaml,
        "--output", out_dir,
        "opts",
    ]
    # Tiny shapes for CPU: override via opts.
    argv = argv[:-1] + [
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TPU.IMAGE_BUCKETS", "[[96, 96], [96, 128], [128, 96]]",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "16",
        "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "4",
        "MODEL.ROI_MASK_HEAD.MASK_INFERENCE", "False",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib

    eval_glass = importlib.import_module("eval_glass")
    eval_glass.main()

    with open(os.path.join(out_dir, "results.json")) as f:
        results = json.load(f)
    assert "toy_test" in results
    assert set(results["toy_test"]) == {"E2E_RESULTS", "DETECTION_ONLY_RESULTS"}
    for group in results["toy_test"].values():
        assert set(group) == {"precision", "recall", "hmean"}
