import numpy as np
import jax.numpy as jnp

from glass_tpu.postprocess.device_merge import merge_intersecting_boxes_device


def test_device_merge_matches_host_semantics():
    # Two overlapping same-height boxes + one isolated; padded to 8 slots.
    boxes = np.zeros((8, 5), np.float32)
    boxes[:, 2:4] = 1.0
    boxes[0] = [50, 50, 30, 10, 0]
    boxes[1] = [60, 50, 30, 10, 0]
    boxes[2] = [200, 200, 30, 10, 0]
    scores = np.zeros(8, np.float32)
    scores[:3] = [0.9, 0.8, 0.9]
    valid = np.zeros(8, bool)
    valid[:3] = True

    out_boxes, out_valid = merge_intersecting_boxes_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
    )
    out_boxes, out_valid = np.asarray(out_boxes), np.asarray(out_valid)
    # The overlapping pair merges into one surviving box; isolated box kept.
    assert out_valid.sum() == 2
    kept = out_boxes[out_valid]
    widths = sorted(kept[:, 2])
    assert abs(widths[-1] - 40.0) < 1.5  # union spans [35, 75]
    assert any(abs(b[0] - 200) < 1e-3 for b in kept)


def test_device_merge_respects_gates():
    # Overlapping boxes with very different heights must NOT merge.
    boxes = np.zeros((4, 5), np.float32)
    boxes[:, 2:4] = 1.0
    boxes[0] = [50, 50, 30, 10, 0]
    boxes[1] = [52, 50, 30, 40, 0]
    scores = np.array([0.9, 0.8, 0, 0], np.float32)
    valid = np.array([True, True, False, False])
    out_boxes, out_valid = merge_intersecting_boxes_device(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
    )
    assert np.asarray(out_valid).sum() == 2
    np.testing.assert_allclose(np.asarray(out_boxes)[0], boxes[0], atol=1e-4)


def test_on_device_flag_wires_through_post_processor():
    """POST_PROCESSING.ON_DEVICE routes the prod post-processor's merge
    through device_merge and agrees with the host numpy fixpoint."""
    from glass_tpu.config import get_cfg
    from glass_tpu.postprocess.post_processor import PostProcessorRotatedBoxes
    from glass_tpu.structures import Instances

    rng = np.random.RandomState(3)
    n = 12
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = rng.uniform(40, 400, n)
    boxes[:, 1] = rng.uniform(40, 300, n)
    boxes[:, 2] = rng.uniform(20, 60, n)
    boxes[:, 3] = rng.uniform(8, 14, n)
    boxes[:, 4] = rng.uniform(-5, 5, n)
    boxes[3] = boxes[0] + [8, 1, 0, 0, 1]   # guaranteed overlapping pair
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)

    def make_preds():
        return Instances((480, 640), pred_boxes=boxes.copy(), scores=scores.copy())

    cfg = get_cfg()
    cfg.POST_PROCESSING.NAME = "PostProcessorRotatedBoxes"
    host_pp = PostProcessorRotatedBoxes(cfg)
    cfg2 = cfg.clone()
    cfg2.POST_PROCESSING.ON_DEVICE = True
    dev_pp = PostProcessorRotatedBoxes(cfg2)
    assert dev_pp.on_device and not host_pp.on_device

    host_out = host_pp(make_preds())
    dev_out = dev_pp(make_preds())
    assert len(host_out) == len(dev_out)
    hb = np.asarray(host_out.pred_boxes)
    db = np.asarray(dev_out.pred_boxes)
    # Same score multiset (ordering is descending-score in both paths).
    np.testing.assert_allclose(
        np.sort(np.asarray(host_out.scores)), np.sort(np.asarray(dev_out.scores)),
        atol=1e-6,
    )
    # Same surviving box set (match by nearest center).
    for b in hb:
        d = np.abs(db[:, :2] - b[:2]).sum(axis=1)
        assert d.min() < 2.0, (b, db)
