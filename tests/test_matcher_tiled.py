"""Tiled (hierarchical tile pre-filter) RPN matcher vs the flat scan path.

The tiled backend (matcher.rpn_label_anchors_tiled) must reproduce the
flat rpn_label_anchors exactly whenever no pool overflows — same labels,
same matched gt indices — because both compute the same exact-IoU pools,
just through different candidate enumeration orders.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glass_tpu.models import rpn as rpn_mod
from glass_tpu.ops.iou_rotated import pairwise_iou_rotated
from glass_tpu.train.matcher import (
    _tile_tables,
    rpn_label_anchors,
    rpn_label_anchors_tiled,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


SIZES = ((16,), (32,), (64,), (128,), (256,))
ASPECTS = (0.2, 0.5, 1.0)
ANGLES = (-90, -45, 0, 45)
STRIDES = (4, 8, 16, 32, 64)


def _specs(img_h, img_w):
    specs = []
    for i, s in enumerate(STRIDES):
        cell = rpn_mod.generate_cell_anchors(SIZES[i], ASPECTS, ANGLES)
        specs.append((-(-img_h // s), -(-img_w // s), s, cell, 0.0))
    return tuple(specs)


def _anchors(specs):
    return jnp.asarray(
        np.concatenate(
            [
                rpn_mod.generate_anchors_for_level(h, w, s, cell, off)
                for h, w, s, cell, off in specs
            ]
        )
    )


def _gt(rng, g, img_h, img_w):
    return np.stack(
        [
            rng.uniform(10, img_w - 10, g), rng.uniform(10, img_h - 10, g),
            rng.uniform(10, 90, g), rng.uniform(6, 28, g),
            rng.uniform(-90, 90, g),
        ],
        axis=1,
    ).astype(np.float32)


@pytest.mark.parametrize("n_valid,g_cap,k", [(8, 16, 16384), (20, 64, 16384), (120, 256, 131072)])
def test_tiled_matches_flat_multilevel(rng, n_valid, g_cap, k):
    # non-square image; p5/p6 grids smaller than the tile -> edge masking
    img_h, img_w = 320, 256
    specs = _specs(img_h, img_w)
    anchors = _anchors(specs)
    gt = jnp.asarray(_gt(rng, g_cap, img_h, img_w))
    gv = jnp.asarray(np.arange(g_cap) < n_valid)

    labels_f, matched_f, diag_f = rpn_label_anchors(gt, gv, anchors, k=k)
    labels_t, matched_t, diag_t = rpn_label_anchors_tiled(
        gt, gv, specs, k=k, tile_cap=512
    )
    assert float(diag_f["matcher_pool_dropped"]) == 0
    assert float(diag_t["matcher_pool_dropped"]) == 0
    assert float(diag_t["matcher_tile_dropped"]) == 0
    np.testing.assert_array_equal(np.asarray(labels_t), np.asarray(labels_f))
    np.testing.assert_array_equal(np.asarray(matched_t), np.asarray(matched_f))


def test_tiled_empty_gt(rng):
    specs = _specs(128, 128)
    gt = jnp.asarray(_gt(rng, 8, 128, 128))
    gv = jnp.zeros(8, bool)
    labels, matched, diag = rpn_label_anchors_tiled(gt, gv, specs, k=4096)
    assert not np.asarray(labels).any()
    assert float(diag["matcher_tile_dropped"]) == 0


def test_tiled_overflow_counter(rng):
    specs = _specs(256, 256)
    gt = jnp.asarray(_gt(rng, 64, 256, 256))
    gv = jnp.ones(64, bool)
    _, _, diag = rpn_label_anchors_tiled(gt, gv, specs, k=16384, tile_cap=4)
    assert float(diag["matcher_tile_dropped"]) > 0


def test_tile_cover_flags_are_superset_of_dense(rng):
    """Any anchor with dense IoU >= lo must live in a bound-flagged tile."""
    from glass_tpu.train.matcher import _blockwise_bound_reduce

    h, w, stride = 20, 16, 8
    cell = rpn_mod.generate_cell_anchors((32,), ASPECTS, ANGLES)
    specs = ((h, w, stride, cell, 0.0),)
    anchors = _anchors(specs)
    tab = _tile_tables(specs, 16)
    g = 24
    gt = jnp.asarray(_gt(rng, g, h * stride, w * stride))
    gv = jnp.ones(g, bool)

    lo = 0.3
    tflags = np.asarray(
        _blockwise_bound_reduce(
            gt, gv, jnp.asarray(tab["box"]), area2=jnp.asarray(tab["area"])
        )
        >= lo - 1e-4
    )
    iou = np.asarray(pairwise_iou_rotated(gt, anchors))
    K = cell.shape[0]
    ntx = -(-w // 16)
    hot = np.where(iou.max(axis=0) >= lo)[0]
    for a_idx in hot:
        loc, kid = divmod(int(a_idx), K)
        gy, gx = divmod(loc, w)
        trow = ((gy // 16) * ntx + (gx // 16)) * K + kid
        assert tflags[trow], f"anchor {a_idx} (iou {iou[:, a_idx].max():.3f}) in unflagged tile"


def test_tile_tables_global_index_roundtrip():
    """Materialized global ids must hit exactly the anchors of their tile."""
    from glass_tpu.train.matcher import _materialize_tile_anchors

    specs = _specs(96, 64)
    anchors = np.asarray(_anchors(specs))
    tab_np = _tile_tables(specs, 16)
    nt = tab_np["box"].shape[0]
    tab = {k: jnp.asarray(v) for k, v in tab_np.items() if k != "num_anchors"}
    t_idx = jnp.arange(nt, dtype=jnp.int32)
    t_val = jnp.ones(nt, bool)
    boxes, gidx, valid = _materialize_tile_anchors(tab, t_idx, t_val, 16)
    boxes, gidx, valid = np.asarray(boxes), np.asarray(gidx), np.asarray(valid)
    # every valid materialized anchor equals the anchor at its global id
    np.testing.assert_allclose(
        boxes[valid], anchors[gidx[valid]], rtol=1e-6, atol=1e-4
    )
    # coverage: every anchor id appears exactly once among valid slots
    ids = np.sort(gidx[valid])
    np.testing.assert_array_equal(ids, np.arange(tab_np["num_anchors"]))


@pytest.mark.slow
def test_train_forward_tiled_backend_matches_scan():
    """Full glass_train_forward with TPU.MATCH_BACKEND=tiled: identical
    losses to the scan backend (labels identical when nothing overflows,
    so the sampled sets and every downstream loss agree exactly)."""
    import dataclasses
    import jax
    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.train.train_step import TrainConfig, glass_train_forward
    from tests.test_train_step import TINY_ARCH, make_batch

    params = init_glass_params(jax.random.PRNGKey(0), TINY_ARCH)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    tcfg_scan = TrainConfig(
        rpn_pre_nms_topk=64, rpn_post_nms_topk=16, roi_batch_per_image=32,
        words_per_image=4, masks_per_image=4, match_topk=4096,
        match_backend="scan",
    )
    tcfg_tiled = dataclasses.replace(tcfg_scan, match_backend="tiled")
    key = jax.random.PRNGKey(1)
    tot_s, losses_s, _ = glass_train_forward(TINY_ARCH, tcfg_scan, params, batch, key)
    tot_t, losses_t, _ = glass_train_forward(TINY_ARCH, tcfg_tiled, params, batch, key)
    assert float(losses_t["matcher_tile_dropped"]) == 0
    assert float(losses_s["matcher_pool_dropped"]) == 0
    for name in losses_s:
        np.testing.assert_allclose(
            float(losses_s[name]), float(losses_t[name]), rtol=1e-6,
            err_msg=name,
        )
    np.testing.assert_allclose(float(tot_s), float(tot_t), rtol=1e-6)


def test_pool_sampler_consistent_with_flat_labels(rng):
    """Pool-sampled positives/negatives must be consistent with the flat
    matcher's labels: every sampled positive has label 1 (and the right
    matched gt), every sampled negative label 0, counts match the
    fg-capped / batch-filling rule, and negative draws are distinct."""
    import jax
    from glass_tpu.train.matcher import subsample_rpn_from_pools

    img_h, img_w = 320, 256
    specs = _specs(img_h, img_w)
    anchors = _anchors(specs)
    g = 40
    gt = jnp.asarray(_gt(rng, g, img_h, img_w))
    gv = jnp.ones(g, bool)

    labels_f, matched_f, _ = rpn_label_anchors(gt, gv, anchors, k=16384)
    labels_f, matched_f = np.asarray(labels_f), np.asarray(matched_f)

    pools, diag = rpn_label_anchors_tiled(
        gt, gv, specs, k=16384, tile_cap=512, return_pools=True
    )
    assert float(diag["matcher_tile_dropped"]) == 0
    num_samples, pos_frac = 64, 0.5
    pos_idx, pos_val, pos_gt, neg_idx, neg_val = jax.tree_util.tree_map(
        np.asarray,
        subsample_rpn_from_pools(
            jax.random.PRNGKey(3), pools, num_samples, pos_frac
        ),
    )
    n_fg = int((labels_f == 1).sum())
    exp_pos = min(n_fg, int(num_samples * pos_frac))
    assert pos_val.sum() == exp_pos
    assert neg_val.sum() == num_samples - exp_pos  # plenty of negatives
    sampled_pos = pos_idx[pos_val]
    assert (labels_f[sampled_pos] == 1).all()
    assert len(set(sampled_pos.tolist())) == len(sampled_pos)
    # matched gt agrees with the flat matcher's per-anchor argmax
    np.testing.assert_array_equal(pos_gt[pos_val], matched_f[sampled_pos])
    sampled_neg = neg_idx[neg_val]
    assert (labels_f[sampled_neg] == 0).all()
    assert len(set(sampled_neg.tolist())) == len(sampled_neg)


@pytest.mark.slow
def test_train_forward_pool_sampler_runs():
    """Full train forward with the (A,)-free pool sampler: finite losses,
    sampled-anchor diagnostics within the batch budget."""
    import dataclasses
    import jax
    from glass_tpu.models import init_glass_params
    from glass_tpu.train.train_step import TrainConfig, glass_train_forward
    from tests.test_train_step import TINY_ARCH, make_batch

    params = init_glass_params(jax.random.PRNGKey(0), TINY_ARCH)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    tcfg = TrainConfig(
        rpn_pre_nms_topk=64, rpn_post_nms_topk=16, roi_batch_per_image=32,
        words_per_image=4, masks_per_image=4, match_topk=4096,
        match_backend="tiled", rpn_sampler="pool",
    )
    total, losses, _ = glass_train_forward(
        TINY_ARCH, tcfg, params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert (
        float(losses["rpn/num_pos_anchors"] + losses["rpn/num_neg_anchors"])
        <= tcfg.rpn_batch_per_image + 1e-6
    )
