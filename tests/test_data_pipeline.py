"""Data pipeline tests on a synthetic COCO dataset."""

import json
import os

import numpy as np
import cv2
import pytest

from glass_tpu.config import get_cfg
from glass_tpu.data import load_coco_json, DatasetMapper, PaddedBatchBuilder
from glass_tpu.data.dataset import rotated_box_anno_to_xywha
from glass_tpu.data.mapper import (
    rotation_aug,
    resize_aug,
    hflip_aug,
    apply_aug_rotated_boxes,
    shortest_edge_size,
)


def _make_dataset(tmp_path, n_images=3):
    root = tmp_path / "toy_coco"
    root.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h, w = 120, 160
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.png"
        cv2.imwrite(str(root / fname), img)
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for _ in range(3):
            cx, cy = rng.uniform(30, w - 30), rng.uniform(30, h - 30)
            bw, bh = rng.uniform(20, 40), rng.uniform(8, 16)
            quad = [
                [cx - bw / 2, cy - bh / 2],
                [cx + bw / 2, cy - bh / 2],
                [cx + bw / 2, cy + bh / 2],
                [cx - bw / 2, cy + bh / 2],
            ]
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": 1,
                    "bbox": [cx - bw / 2, cy - bh / 2, bw, bh],
                    "rotated_box": quad,
                    "segmentation": [[c for pt in quad for c in pt]],
                    "rec": "word",
                    "text": "word",
                    "angle": 0,
                    "orientation": 0,
                    "area": bw * bh,
                    "iscrowd": 0,
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "word"}],
    }
    with open(root / "annotations.json", "w") as f:
        json.dump(coco, f)
    return str(root)


def test_rotated_box_anno_conversion():
    quad = [[0, 0], [10, 0], [10, 4], [0, 4]]
    xywha = rotated_box_anno_to_xywha(quad)
    np.testing.assert_allclose(xywha, [5, 2, 10, 4, 0], atol=1e-6)
    # Rotated 90 CCW (in image coords): top-left (0,10), going clockwise.
    quad90 = [[0, 10], [0, 0], [4, 0], [4, 10]]
    xywha90 = rotated_box_anno_to_xywha(quad90)
    np.testing.assert_allclose(xywha90, [2, 5, 10, 4, 90], atol=1e-6)


def test_aug_box_transforms():
    boxes = np.array([[50.0, 30.0, 20.0, 10.0, 0.0]], np.float32)
    flip = hflip_aug(100, 200)
    out = apply_aug_rotated_boxes(flip, boxes)
    np.testing.assert_allclose(out[0], [150, 30, 20, 10, 0], atol=1e-5)

    rot = rotation_aug(100, 200, 90)
    out = apply_aug_rotated_boxes(rot, boxes)
    assert abs(out[0, 4] - 90) < 1e-5
    # After a 90 deg CCW rotation with expand, canvas is 200x100.
    assert rot.out_size == (200, 100)

    rs = resize_aug(100, 200, 200, 400)
    out = apply_aug_rotated_boxes(rs, boxes)
    np.testing.assert_allclose(out[0], [100, 60, 40, 20, 0], atol=1e-4)


def test_shortest_edge():
    # 720x1280 with short=1000 overshoots max 1600 -> proportionally capped.
    assert shortest_edge_size(720, 1280, 1000, 1600) == (900, 1600)
    assert shortest_edge_size(720, 960, 1000, 1600) == (1000, 1333)


def test_mapper_and_batcher(tmp_path):
    root = _make_dataset(tmp_path)
    cfg = get_cfg()
    cfg.MODEL.ROI_RECOGNIZER_HEAD.NAME = "RecognizerRCNNHeadV3"
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 10
    cfg.INPUT.MIN_SIZE_TRAIN = (96, 128)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "range"
    cfg.INPUT.MAX_SIZE_TRAIN = 200
    cfg.INPUT.ROTATION.ENABLED = True
    cfg.INPUT.ROTATION.ANGLES = [0, 90, 180, 270]
    cfg.TPU.MAX_GT_INSTANCES = 8

    records = load_coco_json(os.path.join(root, "annotations.json"), root, "toy_coco")
    assert len(records) == 3
    assert len(records[0]["annotations"]) == 3
    assert records[0]["annotations"][0]["text"] == "word"

    mapper = DatasetMapper(cfg, is_train=True, rng=np.random.RandomState(1))
    sample = mapper(records[0])
    assert sample["image"].ndim == 3
    assert len(sample["gt_boxes"]) == 3
    assert sample["gt_text"].shape == (3, 12)
    # encoded 'word' = [0, w, o, r, d, stop(1), 0...]
    assert sample["gt_text"][0, 0] == 0 and (sample["gt_text"][0] == 1).sum() == 1
    assert set(np.unique(sample["gt_orientation"])) <= {0, 1, 2, 3}

    builder = PaddedBatchBuilder(cfg)
    batch = builder([mapper(r) for r in records])
    assert batch["images"].shape[0] == 3
    assert batch["images"].shape[1] % 32 == 0
    assert batch["gt_boxes"].shape == (3, 8, 5)
    assert batch["gt_valid"].sum() == 9
    assert batch["gt_polygons"].shape[-2:] == (cfg.TPU.MAX_POLY_VERTICES, 2)
    assert (batch["gt_poly_nv"][batch["gt_valid"]] == 4).all()


def test_instance_aware_random_crop(tmp_path):
    """Crops center on a gt instance (reference dataset_mapper.py:89-100 +
    d2 gen_crop_transform_with_instance): every cropped sample must keep at
    least one gt box center inside the crop window."""
    root = _make_dataset(tmp_path)
    cfg = get_cfg()
    cfg.MODEL.ROI_RECOGNIZER_HEAD.NAME = "RecognizerRCNNHeadV3"
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 10
    cfg.INPUT.MIN_SIZE_TRAIN = (96, 128)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "range"
    cfg.INPUT.MAX_SIZE_TRAIN = 200
    cfg.INPUT.ROTATION.ENABLED = False
    cfg.DATASETS.RANDOM_CROP_PROB = 1.0  # crop every sample

    records = load_coco_json(os.path.join(root, "annotations.json"), root, "toy_coco")
    mapper = DatasetMapper(cfg, is_train=True, rng=np.random.RandomState(7))
    for trial in range(20):
        sample = mapper(records[trial % len(records)])
        h, w = sample["image"].shape[:2]
        boxes = sample["gt_boxes"]
        assert len(boxes) > 0
        inside = (
            (boxes[:, 0] >= 0) & (boxes[:, 0] <= w)
            & (boxes[:, 1] >= 0) & (boxes[:, 1] <= h)
        )
        assert inside.any(), f"trial {trial}: no gt center survived the crop"


def test_threaded_loader_matches_serial_order():
    """DATALOADER.NUM_WORKERS thread pool preserves the serial sample order
    (deterministic resume depends on it)."""
    from glass_tpu.config import get_cfg
    from glass_tpu.data.loader import build_train_loader

    cfg = get_cfg()
    cfg.TPU.MAX_GT_INSTANCES = 4
    records = [{"annotations": [1], "rid": i} for i in range(10)]

    def mapper(rec):
        i = rec["rid"]
        return {
            "image": np.full((8, 8, 3), i, np.float32),
            "gt_boxes": np.array([[4.0, 4.0, 2.0, 2.0, 0.0]]),
            "gt_classes": np.zeros(1, np.int32),
            "gt_orientation": np.zeros(1, np.int32),
            "gt_text": np.zeros((1, 27), np.int32),
            "gt_polygons": [np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)],
        }

    def first_ids(num_workers, n=3):
        cfg2 = cfg.clone()
        cfg2.DATALOADER.NUM_WORKERS = num_workers
        loader = build_train_loader(cfg2, records, mapper, batch_size=4, seed=7)
        out = []
        for _ in range(n):
            batch = next(loader)
            out.append(batch["images"][:, 0, 0, 0].astype(int).tolist())
        return out

    assert first_ids(0) == first_ids(3)
