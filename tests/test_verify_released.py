"""Dry-run of tools/verify_released_checkpoint.py (VERDICT r2 #1c).

Network and the released ``.pth`` files are unavailable here, so the
one-command verification script is exercised end-to-end against a locally
generated checkpoint in the reference's torch state-dict naming + a
synthetic dataset: download-skip, torch->tree conversion, eval via
tools/eval_glass.py, and the verification report.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os
import sys

import numpy as np
import cv2

REPO = os.path.join(os.path.dirname(__file__), "..")


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


def _make_torch_checkpoint(tmp_path) -> str:
    """Random-weight checkpoint in the d2 state-dict naming (the same
    reverse mapping the converter-roundtrip test validates)."""
    import jax
    import torch

    from glass_tpu.models import GlassArch, init_glass_params
    from tests.test_checkpoint import _flatten, _torchify_name_and_value

    arch = GlassArch(mask_inference=True)
    params = init_glass_params(jax.random.PRNGKey(1), arch)
    state = {}
    for path, v in _flatten(params).items():
        name, tv = _torchify_name_and_value(path, v)
        state[name] = torch.from_numpy(np.asarray(tv).copy())
    path = str(tmp_path / "released_like.pth")
    torch.save({"model": state}, path)
    return path


def test_verify_script_dry_run(tmp_path):
    ds_yaml = _make_dataset(tmp_path)
    ckpt = _make_torch_checkpoint(tmp_path)
    out = str(tmp_path / "out")
    cfg_path = os.path.join(REPO, "configs", "glass_finetune_icdar15.yaml")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import importlib

    verify = importlib.import_module("verify_released_checkpoint")

    rc = verify.main([
        "--dry-run",
        "--checkpoint", ckpt,
        "--config", cfg_path,
        "--datasets", ds_yaml,
        "--output", out,
        # tiny shapes for CPU
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TPU.IMAGE_BUCKETS", "[[96, 96], [96, 128], [128, 96]]",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "16",
        "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "4",
        "MODEL.ROI_MASK_HEAD.MASK_INFERENCE", "False",
        "TPU.COMPUTE_DTYPE", "float32",
    ])
    assert rc == 0  # no expected hmean -> records, passes

    report = json.load(open(os.path.join(out, "verification_report.json")))
    assert report["pass"] is True
    assert "measured_hmean" in report and 0.0 <= report["measured_hmean"] <= 1.0
    assert report["expected_hmean"] is None
    assert os.path.exists(os.path.join(out, "results.json"))

    # With an expected hmean a random-weight model must FAIL the diff.
    rc2 = verify.main([
        "--dry-run",
        "--checkpoint", ckpt,
        "--config", cfg_path,
        "--datasets", ds_yaml,
        "--output", out,
        "--expected-hmean", "0.85",
        "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "96",
        "TPU.IMAGE_BUCKETS", "[[96, 96], [96, 128], [128, 96]]",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "16",
        "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "4",
        "MODEL.ROI_MASK_HEAD.MASK_INFERENCE", "False",
        "TPU.COMPUTE_DTYPE", "float32",
    ])
    assert rc2 == 1
    report = json.load(open(os.path.join(out, "verification_report.json")))
    assert report["pass"] is False and report["diff"] > 0.5


def test_released_url_table():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import importlib

    verify = importlib.import_module("verify_released_checkpoint")
    assert set(verify.RELEASED) == {"icdar15", "totaltext", "textocr"}
    for urls in verify.RELEASED.values():
        assert urls["checkpoint"].startswith("https://") and urls["checkpoint"].endswith(".pth")
        assert urls["config"].startswith("https://") and urls["config"].endswith(".yaml")
