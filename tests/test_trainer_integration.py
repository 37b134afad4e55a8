"""End-to-end Trainer integration on a synthetic dataset (tiny, CPU mesh)."""

import pytest

pytestmark = pytest.mark.slow

import json
import os

import numpy as np
import cv2
import pytest

from glass_tpu.config import get_cfg


def _make_dataset(tmp_path, n_images=4):
    root = tmp_path / "ds"
    (root / "toy_train").mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h, w = 80, 96
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "toy_train" / f"img_{i}.png"), img)
        images.append({"id": i + 1, "file_name": f"img_{i}.png", "height": h, "width": w})
        for _ in range(2):
            cx, cy = rng.uniform(25, w - 25), rng.uniform(20, h - 20)
            bw, bh = rng.uniform(16, 30), rng.uniform(8, 12)
            quad = [
                [cx - bw / 2, cy - bh / 2], [cx + bw / 2, cy - bh / 2],
                [cx + bw / 2, cy + bh / 2], [cx - bw / 2, cy + bh / 2],
            ]
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": 1,
                "bbox": [cx - bw / 2, cy - bh / 2, bw, bh],
                "rotated_box": quad,
                "segmentation": [[c for pt in quad for c in pt]],
                "rec": "hi", "angle": 0, "orientation": 0,
                "area": bw * bh, "iscrowd": 0,
            })
            aid += 1
    with open(root / "toy_train" / "annotations.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "word"}]}, f)
    return str(root)


def test_trainer_runs_steps_and_checkpoints(tmp_path):
    import jax

    root = _make_dataset(tmp_path)
    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.DATASETS.TRAIN = ["toy_train"]
    cfg.DATASETS.ROOT = root
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.SOLVER.BASE_LR = 0.001
    cfg.INPUT.MIN_SIZE_TRAIN = (64, 80)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 5
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_BATCH_SIZE = 2
    cfg.TPU.MAX_GT_INSTANCES = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 8

    from glass_tpu.train import Trainer
    from glass_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:2])
    trainer = Trainer(cfg, mesh=mesh)
    trainer.train(max_iter=2)
    # Final checkpoint saved
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "last_checkpoint"))

    # Resume path restores the iteration counter.
    trainer2 = Trainer(cfg, mesh=mesh)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 2


def test_seeded_augmentations_reproducible(tmp_path):
    """cfg.SEED >= 0 must make the augmentation stream deterministic
    (d2 default_setup: seed_all_rng(seed + rank))."""
    import jax

    root = _make_dataset(tmp_path)
    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.DATASETS.TRAIN = ["toy_train"]
    cfg.DATASETS.ROOT = root
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SEED = 7
    cfg.INPUT.MIN_SIZE_TRAIN = (64, 80)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.TPU.MAX_GT_INSTANCES = 8

    from glass_tpu.train import Trainer
    from glass_tpu.parallel import make_mesh

    def first_batch():
        trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]))
        loader = trainer.build_train_loader()
        return next(iter(loader))

    b1, b2 = first_batch(), first_batch()
    np.testing.assert_array_equal(
        np.asarray(b1["images"]), np.asarray(b2["images"])
    )
    np.testing.assert_array_equal(
        np.asarray(b1["gt_boxes"]), np.asarray(b2["gt_boxes"])
    )


@pytest.mark.slow
def test_precise_bn_replaces_running_stats(tmp_path):
    """TEST.PRECISE_BN: running stats become the average of true batch
    statistics over NUM_ITER train batches (d2 PreciseBN / fvcore
    update_bn_stats semantics), verified by recomputing the same batches'
    statistics directly through glass_train_forward."""
    import jax
    import jax.numpy as jnp

    root = _make_dataset(tmp_path)
    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.DATASETS.TRAIN = ["toy_train"]
    cfg.DATASETS.ROOT = root
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.SEED = 3
    cfg.INPUT.MIN_SIZE_TRAIN = (64, 80)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 5
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_BATCH_SIZE = 2
    cfg.TPU.MAX_GT_INSTANCES = 8
    cfg.TEST.PRECISE_BN.ENABLED = True
    cfg.TEST.PRECISE_BN.NUM_ITER = 2

    from glass_tpu.train import Trainer
    from glass_tpu.train.train_step import glass_train_forward
    from glass_tpu.parallel import make_mesh

    path = "backbone.bottom_up.res4.0.conv1.norm"

    def node_of(params):
        node = params
        for part in path.split("."):
            node = node[part]
        return node

    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]))
    before = np.asarray(node_of(trainer.params)["running_mean"]).copy()

    # independently collect the SAME two batches' statistics (fresh trainer,
    # same SEED -> identical loader + key sequence)
    ref = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]))
    loader = iter(ref.build_train_loader())
    key = ref._rng
    # jit exactly like precise_bn does: under the default bf16 compute
    # dtype, eager-vs-jit fusion differences shift batch stats ~1e-3
    arch, tcfg = ref.arch, ref.tcfg

    @jax.jit
    def bn_stats(params, batch, k):
        return glass_train_forward(arch, tcfg, params, batch, k)[2]

    upds = []
    for _ in range(2):
        batch = next(loader)
        key, k = jax.random.split(key)
        upds.append(
            jax.tree_util.tree_map(np.asarray, bn_stats(ref.params, batch, k))
        )
    avg_upd = np.mean([u[path]["running_mean"] for u in upds], axis=0)
    want = (avg_upd - 0.9 * before) / 0.1

    trainer.precise_bn()
    after = np.asarray(node_of(trainer.params)["running_mean"])
    assert not np.allclose(after, before)
    np.testing.assert_allclose(after, want, rtol=1e-4, atol=1e-5)


def test_trainer_rejects_indivisible_batch(tmp_path):
    """IMS_PER_BATCH not divisible by the data-mesh size must raise the
    descriptive error (not a deep pjit sharding failure), and
    TPU.TRAIN_DEVICES restricts the mesh so the same batch is accepted."""
    import pytest

    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SOLVER.IMS_PER_BATCH = 3  # 8 virtual devices in the test tier
    from glass_tpu.train import Trainer

    with pytest.raises(ValueError, match="divisible by the data-mesh size"):
        Trainer(cfg)
