"""Generalized task-level learning proof: held-out images, rotated words,
masks on, orientation head (round-5 verdict item 3).

Extends ``test_learning_synthetic.py`` (which certifies memorization of
axis-aligned text on the training images) along the three axes that make
GLASS GLASS:

* **Generalization** — eval runs on FRESHLY RENDERED held-out images
  (different seed, placements and word/orientation pairings than any
  training image).
* **Rotation / orientation** — training images are upright but
  ``INPUT.ROTATION`` augmentation rotates them by 0/90/180/270 (reference
  ``dataset_mapper.py:178-192`` gt-orientation assembly), and the held-out
  eval images contain words at all four cardinal orientations, so E2E
  transcription REQUIRES a working orientation head: box regression is
  trained with the period-180 sine-square loss and cannot distinguish a
  180-rotated word; only the orientation overwrite
  (``rotated_box_utils.py:4``) makes its crop readable.
* **Masks on** — ``MODEL.MASK_ON True`` trains the rotated mask head
  (reference ``rotated_mask_head.py:325``) against the in-graph
  rasterized quad polygons.

Assertions: held-out det hmean >= 0.8, E2E hmean >= 0.5 (reference RRC
protocol through the real CLIs), and orientation accuracy >= 0.9 on
IoU-matched detections (direct GlassRunner pass with the orientation
head applied to boxes).

Runtime: ~2-3 h single-core XLA-CPU (slow tier);
``GLASS_TPU_LEARNING_TEST_ITERS`` trades runtime for margin.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import cv2

from test_learning_synthetic import GLYPHS, WORDS, render_word

H = W = 96  # square: every 90-degree rotation shares one compile bucket
MAX_ITER = int(os.environ.get("GLASS_TPU_LEARNING_TEST_ITERS", "1200"))


def place_word(img, rng, word: str, k: int):
    """Paste ``word`` rotated by k*90 deg CCW; return (quad, k).

    The quad lists the box corners in READING order (reading-TL first,
    reading direction = first edge), which is what
    ``rotated_box_anno_to_xywha`` consumes; the annotation ``angle``
    carries the cardinal rotation that drives gt_orientation
    (mapper: orientation = round((angle + aug_angle)/90) % 4).
    """
    glyph = render_word(word)
    glyph = np.rot90(glyph, k)
    gh, gw = glyph.shape
    pad = 3
    x0 = rng.randint(pad, W - gw - pad)
    y0 = rng.randint(pad, H - gh - pad)
    img[y0 - pad : y0 + gh + pad, x0 - pad : x0 + gw + pad] = 0
    img[y0 : y0 + gh, x0 : x0 + gw] = glyph[..., None]
    # axis-aligned paste-rect corners
    tl = [x0 - pad, y0 - pad]
    tr = [x0 + gw + pad, y0 - pad]
    br = [x0 + gw + pad, y0 + gh + pad]
    bl = [x0 - pad, y0 + gh + pad]
    rect = [tl, tr, br, bl]
    # np.rot90(glyph, k) moves the glyph's reading-TL corner: k=0 -> TL,
    # k=1 -> BL, k=2 -> BR, k=3 -> TR; reading order = roll by k
    quad = [rect[(i - k) % 4] for i in range(4)]
    return quad, 90 * k


def make_split(root: str, split: str, n_images: int, seed: int, orientations):
    os.makedirs(f"{root}/{split}", exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations, gt_meta = [], [], []
    aid = 1
    for i in range(n_images):
        img = np.full((H, W, 3), 40, np.uint8)
        img += rng.randint(0, 20, (H, W, 3), dtype=np.uint8)
        word = WORDS[i % len(WORDS)]
        k = orientations[i % len(orientations)]
        quad, angle = place_word(img, rng, word, k)
        annotations.append({
            "id": aid, "image_id": i + 1, "category_id": 1,
            "bbox": [min(p[0] for p in quad), min(p[1] for p in quad),
                     max(p[0] for p in quad) - min(p[0] for p in quad),
                     max(p[1] for p in quad) - min(p[1] for p in quad)],
            "rotated_box": quad,
            "segmentation": [[c for pt in quad for c in pt]],
            "rec": word, "angle": angle, "orientation": angle,
            "area": 1, "iscrowd": 0,
        })
        aid += 1
        cv2.imwrite(f"{root}/{split}/img_{i}.png", img)
        images.append({
            "id": i + 1, "file_name": f"img_{i}.png", "height": H, "width": W
        })
        gt_meta.append({"file": f"{root}/{split}/img_{i}.png",
                        "word": word, "k": k, "quad": quad})
    with open(f"{root}/{split}/annotations.json", "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "word"}],
        }, f)
    return gt_meta


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
    "MODEL.MASK_ON", "True",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "128",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
    "MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH", "5",
    "MODEL.ROI_RECOGNIZER_HEAD.MAX_BATCH_SIZE", "2",
    "TEST.DETECTIONS_PER_IMAGE", "4",
]


def test_train_rotated_then_eval_heldout(tmp_path, monkeypatch):
    root = str(tmp_path / "ds")
    # training: upright words only — rotation AUGMENTATION must teach the
    # orientation head (as in the reference recipe)
    make_split(root, "gen_train", n_images=16, seed=0, orientations=[0])
    # held-out: fresh renders at all four cardinal orientations
    heldout = make_split(
        root, "gen_val", n_images=8, seed=100, orientations=[0, 1, 2, 3]
    )
    ds_yaml = tmp_path / "datasets.yaml"
    ds_yaml.write_text(
        f"ROOT: {root}\nDATASETS:\n  - gen_train\nVAL_DATASETS:\n  - gen_val\n"
    )
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "glass_finetune_icdar15.yaml"
    )
    out_train = str(tmp_path / "train_out")
    out_eval = str(tmp_path / "eval_out")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import importlib

    # ---- train (real CLI), rotation aug ON ---------------------------------
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
        "INPUT.ROTATION.ENABLED", "True",
        "INPUT.ROTATION.ANGLES", "[0, 90, 180, 270]",
        "DATASETS.RANDOM_CROP_PROB", "0.0",
        "TEST.EVAL_PERIOD", "0",
        "VIS_PERIOD", "0",
    ])
    train_glass = importlib.import_module("train_glass")
    train_glass.main()
    ckpt = os.path.join(out_train, f"ckpt_{MAX_ITER - 1:07d}")
    assert os.path.isdir(ckpt), os.listdir(out_train)

    # ---- eval (real CLI) on the HELD-OUT split -----------------------------
    # The CLI's hardwired protocol block disables the orientation head
    # (reference tools/eval_glass.py:106-108 — the official benchmarks are
    # horizontal), which by construction caps rotated-word E2E at ~25%
    # (period-180 box regression cannot distinguish a 180-rotated word;
    # measured: held-out det 1.0 / E2E 0.25 with the head off,
    # records/learning_generalized_tpu_r5.log).  Explicit opts win over
    # the block (reference merge order, eval_glass.py:117), so this test
    # re-enables the head — the GLASS mechanism under test.
    monkeypatch.setattr(sys, "argv", [
        "eval_glass.py",
        "--config", cfg_path,
        "--datasets", str(ds_yaml),
        "--model", ckpt,
        "--output", out_eval,
        *COMMON_OPTS,
        "MODEL.ORIENTATION_ON", "True",
        "MODEL.ROI_ORIENTATION_HEAD.APPLY_TO_BOXES", "True",
    ])
    eval_glass = importlib.import_module("eval_glass")
    eval_glass.main()

    with open(os.path.join(out_eval, "results.json")) as f:
        results = json.load(f)["gen_val"]
    det, e2e = results["DETECTION_ONLY_RESULTS"], results["E2E_RESULTS"]
    print(f"generalized learning test @ iter {MAX_ITER}: det {det}  e2e {e2e}")

    # ---- orientation accuracy on IoU-matched detections --------------------
    # direct runner pass with the orientation head APPLIED (the demo-config
    # path the eval CLI switches off), at the training resolution
    from glass_tpu.config import get_cfg
    from glass_tpu.inference import GlassRunner
    from glass_tpu.ops.iou_rotated import pairwise_iou_rotated
    from glass_tpu.data.dataset import rotated_box_anno_to_xywha

    cfg = get_cfg(cfg_path)
    cfg.merge_from_list(list(COMMON_OPTS))
    cfg.MODEL.ORIENTATION_ON = True
    cfg.MODEL.ROI_ORIENTATION_HEAD.APPLY_TO_BOXES = True
    runner = GlassRunner(model_path=ckpt, cfg=cfg)
    n_match, n_orient_ok = 0, 0
    for meta in heldout:
        img = cv2.imread(meta["file"], cv2.IMREAD_COLOR)
        preds = runner.run_on_resized(img)
        if not len(preds):
            continue
        gt_box = np.asarray(
            [rotated_box_anno_to_xywha(meta["quad"])], np.float32
        )
        ious = np.asarray(
            pairwise_iou_rotated(gt_box, np.asarray(preds.pred_boxes, np.float32))
        )
        j = int(np.argmax(ious[0]))
        if ious[0, j] >= 0.5:
            n_match += 1
            # orientations are the head's 4-way logits per detection
            if int(np.argmax(np.asarray(preds.orientations)[j])) == meta["k"]:
                n_orient_ok += 1
    orient_acc = n_orient_ok / max(n_match, 1)
    print(
        f"orientation: {n_orient_ok}/{n_match} matched dets correct "
        f"(acc {orient_acc:.2f}) over {len(heldout)} held-out images"
    )

    assert det["hmean"] >= 0.8, det
    assert e2e["hmean"] >= 0.5, e2e
    assert n_match >= 6, f"only {n_match}/8 held-out words matched at IoU>=0.5"
    assert orient_acc >= 0.9, (n_orient_ok, n_match)
