"""Training-step tests: loss forward, gradients, and 8-device DP shard_map."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.models import GlassArch, init_glass_params
from glass_tpu.train.train_step import TrainConfig, glass_train_forward


TINY_ARCH = GlassArch(
    rpn_pre_nms_topk=64,
    rpn_post_nms_topk=16,
    detections_per_image=8,
    max_word_len=5,
)
TINY_TCFG = TrainConfig(
    rpn_pre_nms_topk=64,
    rpn_post_nms_topk=16,
    roi_batch_per_image=32,
    words_per_image=4,
    masks_per_image=4,
    match_topk=64,
)


def make_batch(b=1, h=96, w=96, g=6, k=8, t=5, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.stack(
        [
            rng.uniform(20, w - 20, (b, g)),
            rng.uniform(20, h - 20, (b, g)),
            rng.uniform(10, 30, (b, g)),
            rng.uniform(6, 14, (b, g)),
            rng.uniform(-45, 45, (b, g)),
        ],
        axis=-1,
    ).astype(np.float32)
    text = np.zeros((b, g, t + 2), np.int64)
    for bi in range(b):
        for gi in range(g):
            n = rng.randint(1, t)
            text[bi, gi, 1 : 1 + n] = rng.randint(2, 90, n)
            text[bi, gi, 1 + n] = 1  # [s]
    # polygons = the box corners
    from glass_tpu.ops.boxes import boxes_to_polygons

    polys4 = np.asarray(boxes_to_polygons(jnp.asarray(boxes)))  # (b, g, 4, 2)
    polys = np.zeros((b, g, k, 2), np.float32)
    polys[:, :, :4] = polys4
    return {
        "images": rng.rand(b, h, w, 3).astype(np.float32) * 255,
        "content_hw": np.tile([[h, w]], (b, 1)).astype(np.int32),
        "gt_boxes": boxes,
        "gt_valid": np.ones((b, g), bool),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_orientation": rng.randint(0, 4, (b, g)).astype(np.int32),
        "gt_text": text,
        "gt_polygons": polys,
        "gt_poly_nv": np.full((b, g), 4, np.int32),
    }


@pytest.fixture(scope="module")
def tiny_params():
    return init_glass_params(jax.random.PRNGKey(0), TINY_ARCH)


def test_train_forward_losses(tiny_params):
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    total, losses, bn_updates = glass_train_forward(
        TINY_ARCH, TINY_TCFG, tiny_params, batch, jax.random.PRNGKey(1)
    )
    expected = {
        "loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg",
        "loss_orientation", "loss_decoder", "loss_mask",
        # diagnostics ride along as metrics, excluded from the total
        "matcher_pool_dropped", "matcher_weak_dropped",
        # reference EventStorage training diagnostics (rotated_rpn.py:52-57,
        # rotated_fast_rcnn.py:374-397, rotated_mask_head.py:384-396)
        "rpn/num_pos_anchors", "rpn/num_neg_anchors",
        "roi_head/num_fg_samples", "roi_head/num_bg_samples",
        "fast_rcnn/cls_accuracy", "fast_rcnn/fg_cls_accuracy",
        "fast_rcnn/false_negative",
        "mask_rcnn/accuracy", "mask_rcnn/false_positive",
        "mask_rcnn/false_negative",
    }
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    for k in ("fast_rcnn/cls_accuracy", "fast_rcnn/fg_cls_accuracy",
              "mask_rcnn/accuracy"):
        assert 0.0 <= float(losses[k]) <= 1.0, k
    # sampled-anchor counts are bounded by the RPN batch size
    assert 0.0 <= float(losses["rpn/num_pos_anchors"])
    assert float(losses["rpn/num_pos_anchors"] + losses["rpn/num_neg_anchors"]) \
        <= TINY_TCFG.rpn_batch_per_image + 1e-6
    assert np.isfinite(float(total))
    # the optimized objective sums only loss_* entries
    np.testing.assert_allclose(
        float(total),
        sum(float(v) for k, v in losses.items() if k.startswith("loss")),
        rtol=1e-6,
    )
    assert len(bn_updates) > 0  # BN stats were collected


def test_train_grads_flow(tiny_params):
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}

    def loss(p):
        total, _, _ = glass_train_forward(
            TINY_ARCH, TINY_TCFG, p, batch, jax.random.PRNGKey(1)
        )
        return total

    grads = jax.grad(loss)(tiny_params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # Key weights must receive gradient signal.
    g_backbone = grads["backbone"]["bottom_up"]["stem"]["conv1"]["weight"]
    g_rpn = grads["proposal_generator"]["rpn_head"]["conv"]["weight"]
    g_dec = grads["roi_heads"]["recognizer_head"]["decoder"]["fc"]["weight"]
    for g in (g_backbone, g_rpn, g_dec):
        assert np.abs(np.asarray(g)).sum() > 0


def test_parallel_train_step_8dev(tiny_params):
    from glass_tpu.parallel import make_mesh, shard_batch, make_parallel_train_step
    import optax

    assert jax.device_count() >= 8
    mesh = make_mesh(jax.devices()[:8])
    tx = optax.sgd(0.001, momentum=0.9)

    def loss_fn(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        total, losses, bn = glass_train_forward(
            TINY_ARCH, TINY_TCFG, params, batch, key, axis_name="data"
        )
        return total, (losses, bn)

    step = make_parallel_train_step(mesh, loss_fn, tx)
    batch = make_batch(b=8, h=64, w=64)
    batch = shard_batch(mesh, batch)
    opt_state = tx.init(tiny_params)
    params, opt_state, metrics = step(
        tiny_params, opt_state, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(metrics["total_loss"]))
    # Parameters actually moved.
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, tiny_params
    )
    flat, _ = jax.tree_util.tree_flatten(d)
    assert max(flat) > 0


def test_train_forward_featpad(tiny_params):
    """FeatPadV2 applies to the TRAIN-side recognizer global pool too
    (reference wraps the recognizer pooler for both train and inference,
    recognizers_hybrid_head.py:464-471): the padded+masked pool must change
    loss_decoder vs the unpadded arch while all losses stay finite."""
    import dataclasses

    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    arch_pad = dataclasses.replace(TINY_ARCH, pooler_pad="FeatPadV2")
    total, losses, _ = glass_train_forward(
        arch_pad, TINY_TCFG, tiny_params, batch, jax.random.PRNGKey(1)
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    _, losses_nopad, _ = glass_train_forward(
        TINY_ARCH, TINY_TCFG, tiny_params, batch, jax.random.PRNGKey(1)
    )
    assert float(losses["loss_decoder"]) != float(losses_nopad["loss_decoder"])
