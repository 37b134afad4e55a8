"""RPN loss ASSEMBLY parity against an independent transcription.

The sine-square / smooth-l1 formulas are unit-tested against torch
elsewhere; this test validates the full rpn_losses pipeline — dense
matching, label semantics, saturated sampling, delta encoding, masking
and normalization — against a from-scratch numpy implementation of the
reference's loss assembly (rotated_rpn.py:49-94 + rotated_box_losses.py
+ detectron2 Box2BoxTransformRotated.get_deltas + d2 Matcher), with the
dense IoU matrix supplied by OpenCV convex clipping (independent of the
repo's IoU kernel).

Sampling is saturated (caps >= candidate counts) so d2's random
subsample keeps every labeled anchor and both sides are deterministic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from glass_tpu.models import GlassArch
from glass_tpu.models import rpn as rpn_mod
from glass_tpu.train.train_step import TrainConfig, rpn_losses

from tests.test_golden_kernel_vectors import _cv2_iou


def _ref_labels(iou, lo=0.3, hi=0.7):
    """d2 Matcher(thresholds=[lo, hi], labels=[0, -1, 1],
    allow_low_quality_matches=True) on a dense (G, A) matrix."""
    mv = iou.max(axis=0)
    midx = iou.argmax(axis=0)
    labels = np.where(mv >= hi, 1, np.where(mv >= lo, -1, 0))
    best = iou.max(axis=1, keepdims=True)
    lq = ((iou >= best - 1e-5) & (best > 1e-5)).any(axis=0)
    labels = np.where(lq, 1, labels)
    return labels, midx


def _ref_get_deltas(src, tgt, weights):
    """detectron2 Box2BoxTransformRotated.get_deltas."""
    wx, wy, ww, wh, wa = weights
    dx = wx * (tgt[:, 0] - src[:, 0]) / src[:, 2]
    dy = wy * (tgt[:, 1] - src[:, 1]) / src[:, 3]
    dw = ww * np.log(tgt[:, 2] / src[:, 2])
    dh = wh * np.log(tgt[:, 3] / src[:, 3])
    da = tgt[:, 4] - src[:, 4]
    da = (da + 180.0) % 360.0 - 180.0
    da = da * wa * np.pi / 180.0
    return np.stack([dx, dy, dw, dh, da], axis=1)


def _ref_smooth_l1(pred, tgt, beta):
    d = np.abs(pred - tgt)
    if beta == 0:
        return d
    return np.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def _ref_sine_square(pred, tgt, beta, weights):
    """rotated_box_losses.py::sine_square_loss (reduction='none')."""
    box = _ref_smooth_l1(pred[:, :4], tgt[:, :4], beta)
    wa = weights[4]
    diff = (pred[:, 4] - tgt[:, 4]) / wa
    ang = wa * np.sin(diff) ** 2
    return np.concatenate([box, ang[:, None]], axis=1)


def test_rpn_losses_match_independent_reference_assembly():
    rng = np.random.RandomState(3)
    cell = rpn_mod.generate_cell_anchors((32,), (0.2, 0.5, 1.0), (-90, -45, 0, 45))
    h = w = 16
    stride = 8
    anchors = np.asarray(
        rpn_mod.generate_anchors_for_level(h, w, stride, cell, 0.0)
    ).astype(np.float32)
    a = anchors.shape[0]  # 3072
    g = 10
    gt = np.stack(
        [
            rng.uniform(15, 113, g), rng.uniform(15, 113, g),
            rng.uniform(14, 60, g), rng.uniform(8, 24, g),
            rng.uniform(-80, 80, g),
        ],
        axis=1,
    ).astype(np.float32)
    logits = rng.randn(1, a).astype(np.float32)
    deltas = rng.randn(1, a, 5).astype(np.float32) * 0.3

    arch = GlassArch()
    tcfg = TrainConfig(
        rpn_batch_per_image=2 * a,  # saturate: keep every pos and neg
        rpn_positive_fraction=0.5,
        rpn_smooth_l1_beta=0.11,
        rpn_loss_type="sine_square_loss",
        match_topk=a,
    )
    got = rpn_losses(
        arch, tcfg,
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gt)[None], jnp.ones((1, g), bool),
        jax.random.split(jax.random.PRNGKey(0), 1),
    )
    assert float(got["matcher_pool_dropped"]) == 0

    # ---- independent reference assembly ----
    iou = np.zeros((g, a), np.float64)
    for i in range(g):
        for j in range(a):
            iou[i, j], _ = _cv2_iou(gt[i], anchors[j])
    labels, midx = _ref_labels(iou)

    norm = tcfg.rpn_batch_per_image * 1
    valid = labels >= 0
    z = logits[0][valid]
    y = labels[valid].astype(np.float64)
    bce = np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))
    ref_cls = bce.sum() / norm

    pos = labels == 1
    gt_d = _ref_get_deltas(
        anchors[pos], gt[midx[pos]], arch.rpn_bbox_weights
    )
    ref_loc = _ref_sine_square(
        deltas[0][pos].astype(np.float64), gt_d, 0.11, arch.rpn_bbox_weights
    ).sum() / norm

    np.testing.assert_allclose(float(got["loss_rpn_cls"]), ref_cls, rtol=2e-4)
    np.testing.assert_allclose(float(got["loss_rpn_loc"]), ref_loc, rtol=2e-3)
    # the sampled-anchor diagnostics match the dense label counts
    np.testing.assert_allclose(float(got["rpn/num_pos_anchors"]), pos.sum())
    np.testing.assert_allclose(
        float(got["rpn/num_neg_anchors"]), (labels == 0).sum()
    )
