"""End-to-end mirror parity: image -> boxes + orientations + texts + masks
through BOTH frameworks with the SAME converted weights.

The stage-parity tests (test_full_model_parity.py) pin each head against
its torch mirror in isolation; this test closes the remaining gap — the
*wiring* of the single-jit inference graph (stage ordering, layout
conversions, angle/scale handoffs, proposal bookkeeping).  The torch-side
reference pipeline uses the pure-torch network modules for every learned
stage and this repo's independently-tested geometry ops (anchor generation,
delta decoding, rotated NMS via the host numpy implementation, rotated
RoIAlign — each validated against a numpy port of the detectron2 kernels
in its own test) for the non-learned glue, composed in the reference's
documented order (glass_rcnn.py:57-101 + recognizers_hybrid_head
forward_with_given_boxes).

Any mismatch in what the jitted graph feeds where — wrong feature level,
crop from the un-normalized image, orientation applied after NMS instead
of before, NCHW/NHWC flatten mixups — fails here with real numbers.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(__file__))

from torch_mirror import TorchGlassModel, randomize_bn_stats  # noqa: E402

from glass_tpu.config import get_cfg  # noqa: E402
from glass_tpu.models import (  # noqa: E402
    GlassArch,
    glass_inference_single,
    init_glass_params,
)
from glass_tpu.models import rpn as rpn_mod  # noqa: E402
from glass_tpu.models.fpn import FPN_LEVEL_STRIDES  # noqa: E402
from glass_tpu.ops.boxes import (  # noqa: E402
    apply_deltas,
    clip_rotated_boxes,
    nonempty,
    overwrite_orientations_on_boxes,
)
from glass_tpu.ops.roi_align_rotated import (  # noqa: E402
    assign_boxes_to_levels,
    roi_align_rotated,
)
from glass_tpu.postprocess.np_geometry import nms_rotated_np  # noqa: E402
from glass_tpu.train.checkpoint import load_torch_checkpoint  # noqa: E402
from glass_tpu.train.checkpoint import overlay_params  # noqa: E402

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "glass_finetune_icdar15.yaml")

NEG_INF = -1e30


def _nhwc(t):
    return np.asarray(t.detach().numpy())[0].transpose(1, 2, 0)


def _pool_multilevel(feats_nhwc, strides, rois, out_hw, sampling_ratio):
    levels = np.asarray(assign_boxes_to_levels(jnp.asarray(rois), 2, 2 + len(feats_nhwc) - 1))
    out = np.zeros((len(rois),) + tuple(out_hw) + (feats_nhwc[0].shape[-1],), np.float32)
    for li, (f, s) in enumerate(zip(feats_nhwc, strides)):
        sel = np.where(levels == li)[0]
        if len(sel) == 0:
            continue
        pooled = roi_align_rotated(
            jnp.asarray(f), jnp.asarray(rois[sel]), out_hw,
            spatial_scale=1.0 / s, sampling_ratio=sampling_ratio,
        )
        out[sel] = np.asarray(pooled, np.float32)
    return out


def _select_proposals_np(logits, deltas, anchors, image_size, weights,
                         pre, post, nms_thresh):
    all_boxes, all_scores, all_valid = [], [], []
    for lg, dl, an in zip(logits, deltas, anchors):
        k = min(pre, lg.shape[0])
        idx = np.argsort(-lg, kind="stable")[:k]
        scores = lg[idx]
        boxes = np.asarray(apply_deltas(jnp.asarray(dl[idx]), jnp.asarray(an[idx]), weights))
        boxes = np.asarray(clip_rotated_boxes(jnp.asarray(boxes), image_size))
        valid = (
            np.isfinite(scores)
            & np.isfinite(boxes).all(-1)
            & np.asarray(nonempty(jnp.asarray(boxes), 0.0))
        )
        # exact device semantics: non-kept scores -> NEG_INF, valid = kept
        vi = np.where(valid)[0]
        kept_mask = np.zeros(k, bool)
        if len(vi):
            kept_idx_local = nms_rotated_np(boxes[vi], scores[vi], nms_thresh)
            kept_mask[vi[kept_idx_local]] = True
        all_boxes.append(boxes)
        all_scores.append(np.where(kept_mask, scores, NEG_INF))
        all_valid.append(kept_mask)
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    valid = np.concatenate(all_valid)
    top = np.argsort(-scores, kind="stable")[:post]
    return boxes[top], scores[top], valid[top] & (scores[top] > NEG_INF / 2)


def test_e2e_mirror_parity(tmp_path):
    cfg = get_cfg(CFG_PATH)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.ROI_RECOGNIZER_HEAD.MAX_WORD_LENGTH = 5
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.ROI_MASK_HEAD.MASK_INFERENCE = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.TEXT_EMIT = "probs"
    cfg.TPU.CROP_SAMPLING_RATIO = 2  # parity mode: d2's fixed 2x2 grid
    arch = GlassArch.from_config(cfg)
    num_anchors = (len(arch.anchor_aspects) * len(arch.anchor_angles)
                   * len(arch.anchor_sizes[0]))

    torch.manual_seed(3)
    mirror = TorchGlassModel(
        width=64, fpn_ch=256, fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
        num_anchors=num_anchors, vocab=arch.vocab_size,
        local_out=256, max_word_len=arch.max_word_len,
    )
    randomize_bn_stats(mirror)
    mirror.eval()
    path = str(tmp_path / "mirror.pth")
    torch.save({"model": mirror.state_dict()}, path)

    params = overlay_params(
        init_glass_params(jax.random.PRNGKey(0), arch),
        load_torch_checkpoint(path),
    )

    h, w = 160, 192
    rng = np.random.RandomState(0)
    image = (rng.rand(h, w, 3) * 255).astype(np.float32)

    # ---------------- jax: the whole thing in one call -------------------
    out = glass_inference_single(
        arch, params, jnp.asarray(image), jnp.asarray([h, w], np.int32)
    )
    out = jax.tree_util.tree_map(np.asarray, out)

    # ---------------- torch-side reference pipeline ----------------------
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    norm = (image - mean) / std
    x = torch.from_numpy(norm.transpose(2, 0, 1)[None])

    with torch.no_grad():
        feats_t = mirror.backbone(x)
        level_names = list(arch.rpn_in_features)
        feats = {k: _nhwc(feats_t[k]) for k in level_names}
        logits_t, deltas_t = mirror.proposal_generator.rpn_head(
            [feats_t[k] for k in level_names]
        )

    logits, deltas, anchors = [], [], []
    for i, name in enumerate(level_names):
        lg = logits_t[i][0].detach().numpy()  # (A, H, W)
        a_, fh, fw = lg.shape
        # d2 ordering: location-major, anchor-minor (N, H, W, A)
        logits.append(lg.transpose(1, 2, 0).reshape(-1))
        dl = deltas_t[i][0].detach().numpy().reshape(a_, 5, fh, fw)
        deltas.append(dl.transpose(2, 3, 0, 1).reshape(-1, 5))
        cell = rpn_mod.generate_cell_anchors(
            arch.anchor_sizes[i], arch.anchor_aspects, arch.anchor_angles
        )
        anchors.append(rpn_mod.generate_anchors_for_level(
            fh, fw, FPN_LEVEL_STRIDES[name], cell, arch.anchor_offset
        ))

    props, prop_scores, prop_valid = _select_proposals_np(
        logits, deltas, anchors, (h, w), arch.rpn_bbox_weights,
        arch.rpn_pre_nms_topk, arch.rpn_post_nms_topk, arch.rpn_nms_thresh,
    )

    strides = [FPN_LEVEL_STRIDES[f] for f in arch.box_in_features]
    feat_list = [feats[f] for f in arch.box_in_features]
    pooled = _pool_multilevel(feat_list, strides, props, (7, 7),
                              arch.box_pooler_sampling_ratio)
    with torch.no_grad():
        bx = mirror.roi_heads.box_head(
            torch.from_numpy(pooled.transpose(0, 3, 1, 2))
        )
        cls_s, box_d, orient = mirror.roi_heads.box_predictor(bx)
    probs = torch.softmax(cls_s, dim=1).numpy()
    fg = probs[:, 0]
    boxes2 = np.asarray(apply_deltas(
        jnp.asarray(box_d.numpy()), jnp.asarray(props), arch.box_bbox_weights
    ))
    orient_probs = torch.softmax(orient, dim=1).numpy()
    orient_idx = orient_probs.argmax(1)
    boxes2 = np.asarray(overwrite_orientations_on_boxes(
        jnp.asarray(boxes2), jnp.asarray(orient_idx)
    ))
    finite = np.isfinite(boxes2).all(-1) & np.isfinite(fg)
    boxes2 = np.where(finite[:, None], boxes2, 0.0)
    boxes2 = np.asarray(clip_rotated_boxes(jnp.asarray(boxes2), (h, w)))
    det_valid = prop_valid & finite & (fg > arch.score_thresh)
    vi = np.where(det_valid)[0]
    kept = vi[nms_rotated_np(boxes2[vi], fg[vi], arch.nms_thresh)][:arch.detections_per_image]
    order = kept[np.argsort(-fg[kept], kind="stable")]

    ref_boxes = boxes2[order]
    ref_scores = fg[order]
    ref_orient_idx = orient_idx[order]

    # jax side: compare the valid detections
    jvalid = out["valid"].astype(bool)
    n = int(jvalid.sum())
    assert n > 0, "test needs at least one detection; change the seed"
    assert n == len(order), (n, len(order))
    np.testing.assert_allclose(out["boxes"][:n], ref_boxes, atol=0.05, rtol=1e-4)
    np.testing.assert_allclose(out["scores"][:n], ref_scores, atol=1e-4)
    np.testing.assert_array_equal(
        out["orientations"][:n, 0].astype(int), ref_orient_idx
    )

    # ---------------- recognizer + mask on the jax detections ------------
    det_boxes = out["boxes"][:n]
    with torch.no_grad():
        fused_t = mirror.roi_heads.recognizer_feature_fusion(
            feats_t["p2"], feats_t["p3"]
        )
    fused = _nhwc(fused_t)
    gpool = np.asarray(roi_align_rotated(
        jnp.asarray(fused), jnp.asarray(det_boxes), arch.recognizer_pool_hw,
        spatial_scale=1.0 / 4, sampling_ratio=0,
        max_sampling_ratio=arch.pool_max_sampling_ratio,
    ), np.float32)
    crops = np.asarray(roi_align_rotated(
        jnp.asarray(norm), jnp.asarray(det_boxes), arch.img_crop_hw,
        spatial_scale=1.0, sampling_ratio=arch.img_crop_sampling_ratio,
        max_sampling_ratio=arch.crop_max_sampling_ratio,
    ), np.float32)
    with torch.no_grad():
        local = mirror.roi_heads.hybrid_net(
            torch.from_numpy(crops.transpose(0, 3, 1, 2))
        )
        cat = torch.cat([local, torch.from_numpy(gpool.transpose(0, 3, 1, 2))], 1)
        fused_words = mirror.roi_heads.fusion_net(cat)
        text_probs_ref = mirror.roi_heads.recognizer_head(fused_words).numpy()

    np.testing.assert_allclose(
        out["text_probs"][:n], text_probs_ref, atol=2e-3,
        err_msg="recognizer chain wiring mismatch",
    )

    mask_pooled = _pool_multilevel(feat_list, strides, det_boxes, (14, 14), 0)
    with torch.no_grad():
        mlogits = mirror.roi_heads.mask_head(
            torch.from_numpy(mask_pooled.transpose(0, 3, 1, 2))
        )
        mprobs_ref = torch.sigmoid(mlogits[:, 0]).numpy()
    np.testing.assert_allclose(
        out["mask_probs"][:n].astype(np.float32), mprobs_ref, atol=2e-3,
        err_msg="mask head wiring mismatch",
    )
