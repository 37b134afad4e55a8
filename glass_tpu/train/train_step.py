"""The jitted GLASS training step.

Re-implements the reference training forward (call stack SURVEY 3.1:
``GeneralizedRCNN.forward`` training branch +
``MaskRotatedRecognizerHybridHead.forward`` + ``RotatedRPN.losses``) as a
single static-shape jax program:

* anchor labeling via sparse top-K rotated matching (see matcher.py),
* balanced subsampling as weight masks (never dynamic shapes),
* gt appended to proposals before ROI matching
  (``rotated_head.add_ground_truth_to_proposals``),
* gt-orientation overwrite on proposals before mask/recognizer branches
  (``recognizers_hybrid_head.py:160-169``),
* word subsampling with the ``random`` / ``long_first`` strategies
  (``recognizer_head_v2._sample_words:53-68``),
* mask targets rasterized in-graph (targets.py) instead of the reference's
  per-instance CPU rasterization.

Data parallelism: run under ``shard_map`` over the ``data`` mesh axis —
batch-norm statistics and gradients are ``pmean``-ed across it (the
TPU-native SyncBN + DDP allreduce).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.context import Ctx
from ..models.glass_rcnn import (
    GlassArch,
    preprocess,
    backbone_features,
    _multilevel_pool,
)
from ..models import rpn as rpn_mod
from ..models import box_head as bh
from ..models.fusion import p2p3_fusion_apply
from ..models.local_extractor import local_extractor_forward
from ..models.mask_head import mask_head_apply
from ..models.recognizer import recognizer_layers_apply, aster_decode_train
from ..models.fpn import FPN_LEVEL_STRIDES
from ..ops.boxes import get_deltas, overwrite_orientations_on_boxes
from ..ops.iou_rotated import pairwise_iou_rotated
from . import losses as LS
from .matcher import (
    auto_match_pool,
    matcher_assign,
    rpn_label_anchors,
    rpn_label_anchors_tiled,
    subsample_labels,
    subsample_labels_idx,
    subsample_rpn_from_pools,
)
from .targets import mask_targets_for_proposals


@dataclass(frozen=True)
class TrainConfig:
    rpn_batch_per_image: int = 64
    rpn_positive_fraction: float = 0.5
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 300
    rpn_smooth_l1_beta: float = 0.11
    rpn_loss_type: str = "sine_square_loss"
    roi_batch_per_image: int = 512
    roi_positive_fraction: float = 0.25
    roi_iou_threshold: float = 0.5
    box_smooth_l1_beta: float = 1.0
    box_loss_type: str = "sine_square_loss"
    orientation_loss_weight: float = 0.3
    apply_orientation_in_training: bool = True
    recognizer_loss_weight: float = 2.0
    words_per_image: int = 8
    sample_words_strategy: str = "random"
    sample_words_strategy_prob: float = 0.3
    mask_loss_weight: float = 0.005
    masks_per_image: int = 128
    mask_size: int = 28
    match_topk: int = 16384  # exact-IoU anchor-match pool (TPU.MATCH_POOL)
    match_backend: str = "scan"  # TPU.MATCH_BACKEND: scan | tiled
    match_tile_cap: int = 512  # TPU.MATCH_TILE_CAP (tiled backend)
    rpn_sampler: str = "axis"  # TPU.RPN_SAMPLER: axis | pool (needs tiled)

    @classmethod
    def from_config(cls, cfg) -> "TrainConfig":
        rec = cfg.MODEL.ROI_RECOGNIZER_HEAD
        if cfg.TPU.MATCH_BACKEND not in ("scan", "tiled"):
            raise ValueError(
                f"TPU.MATCH_BACKEND must be 'scan' or 'tiled', got "
                f"{cfg.TPU.MATCH_BACKEND!r}"
            )
        if cfg.TPU.RPN_SAMPLER not in ("axis", "pool"):
            raise ValueError(
                f"TPU.RPN_SAMPLER must be 'axis' or 'pool', got "
                f"{cfg.TPU.RPN_SAMPLER!r}"
            )
        if cfg.TPU.RPN_SAMPLER == "pool" and cfg.TPU.MATCH_BACKEND != "tiled":
            raise ValueError(
                "TPU.RPN_SAMPLER='pool' requires TPU.MATCH_BACKEND='tiled' "
                "(positives are sampled from the matcher pools)"
            )
        return cls(
            rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            rpn_pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            rpn_post_nms_topk=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            rpn_smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
            rpn_loss_type=cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE,
            roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            roi_iou_threshold=cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
            box_smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            box_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            orientation_loss_weight=cfg.MODEL.ROI_ORIENTATION_HEAD.LOSS_WEIGHT,
            apply_orientation_in_training=(
                cfg.MODEL.ROI_ORIENTATION_HEAD.APPLY_TO_BOXES_DURING_TRAINING
            ),
            recognizer_loss_weight=rec.LOSS_WEIGHT,
            words_per_image=min(rec.MAX_BATCH_SIZE, cfg.TPU.MAX_WORDS),
            sample_words_strategy=rec.SAMPLE_WORDS_STRATEGY,
            sample_words_strategy_prob=rec.SAMPLE_WORDS_STRATEGY_PROB,
            mask_loss_weight=cfg.MODEL.ROI_MASK_HEAD.LOSS_WEIGHT,
            masks_per_image=int(
                cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
                * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION
            ),
            match_topk=(
                cfg.TPU.MATCH_POOL
                if cfg.TPU.MATCH_POOL > 0
                else auto_match_pool(cfg.TPU.MAX_GT_INSTANCES)
            ),
            match_backend=cfg.TPU.MATCH_BACKEND,
            match_tile_cap=cfg.TPU.MATCH_TILE_CAP,
            rpn_sampler=cfg.TPU.RPN_SAMPLER,
        )


def _select_topk_mask(mask: jnp.ndarray, k: int, key=None, priority=None):
    """Pick up to k True entries of ``mask`` -> (indices (k,), valid (k,)).

    Selection priority: random (if key) or the given priority array, else
    first-come.
    """
    n = mask.shape[0]
    if priority is None:
        if key is not None:
            priority = jax.random.uniform(key, (n,))
        else:
            priority = -jnp.arange(n, dtype=jnp.float32)
    pri = jnp.where(mask, priority, -jnp.inf)
    if k > n:  # fewer candidates than capacity: pad with -inf slots
        pri = jnp.concatenate([pri, jnp.full((k - n,), -jnp.inf)])
    vals, idx = jax.lax.top_k(pri, k)
    idx = jnp.minimum(idx, n - 1)
    return idx, vals > -jnp.inf


def rpn_losses(
    arch: GlassArch,
    tcfg: TrainConfig,
    logits,
    deltas,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    keys: jnp.ndarray,
    level_specs=None,
) -> Dict[str, jnp.ndarray]:
    """Batched RPN losses (reference rotated_rpn.py:20-91).

    logits: (B, A); deltas: (B, A, 5); anchors: (A, 5);
    gt_boxes: (B, G, 5); keys: (B,) rng keys.
    level_specs: static per-level anchor-grid metadata
    ((grid_h, grid_w, stride, cell_anchors, offset), ...) — required for
    the tiled matcher backend (TPU.MATCH_BACKEND="tiled").
    """
    b = logits.shape[0]
    use_tiled = tcfg.match_backend == "tiled" and level_specs is not None

    # Losses touch only the ~rpn_batch_per_image sampled anchors; gather
    # their indices and compute deltas/BCE on the sampled set (the full
    # 1M-anchor get_deltas + masked losses measured ~8 ms/step on v5e).
    if tcfg.rpn_sampler == "pool" and not use_tiled:
        raise ValueError(
            "TPU.RPN_SAMPLER='pool' requires TPU.MATCH_BACKEND='tiled' "
            "(positives are sampled from the matcher pools)"
        )

    def per_image(gt_b, gt_v, key):
        if use_tiled and tcfg.rpn_sampler == "pool":
            # (A,)-free path: labels are never materialized — positives are
            # sampled from the matcher pools, negatives by rejection over
            # the implicit label-0 set (matcher.subsample_rpn_from_pools).
            pools, diag = rpn_label_anchors_tiled(
                gt_b, gt_v, level_specs,
                k=tcfg.match_topk, tile_cap=tcfg.match_tile_cap,
                return_pools=True,
            )
            pos_idx, pos_val, pos_gt, neg_idx, neg_val = subsample_rpn_from_pools(
                key, pools, tcfg.rpn_batch_per_image, tcfg.rpn_positive_fraction
            )
            gt_d = get_deltas(
                anchors[pos_idx], gt_b[pos_gt], arch.rpn_bbox_weights
            )
            return pos_idx, pos_val, neg_idx, neg_val, gt_d, diag
        if use_tiled:
            labels, matched_idx, diag = rpn_label_anchors_tiled(
                gt_b, gt_v, level_specs,
                k=tcfg.match_topk, tile_cap=tcfg.match_tile_cap,
            )
        else:
            labels, matched_idx, diag = rpn_label_anchors(
                gt_b, gt_v, anchors, k=tcfg.match_topk
            )
        pos_idx, pos_val, neg_idx, neg_val = subsample_labels_idx(
            key, labels, tcfg.rpn_batch_per_image, tcfg.rpn_positive_fraction
        )
        gt_d = get_deltas(
            anchors[pos_idx], gt_b[matched_idx[pos_idx]], arch.rpn_bbox_weights
        )
        return pos_idx, pos_val, neg_idx, neg_val, gt_d, diag

    # Static Python loop instead of vmap: under vmap every lax.cond in the
    # matcher lowers to select (both branches execute), which defeats the
    # valid-gt-block skipping that makes matching cost scale with the
    # ~10-40 real gts instead of the 256-row padded capacity.  b is static
    # (1 per chip at the operating point), so unrolling is free.
    per_b = [per_image(gt_boxes[i], gt_valid[i], keys[i]) for i in range(b)]
    pos_idx, pos_val, neg_idx, neg_val, gt_d, diag = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_b
    )

    take = jax.vmap(lambda arr, idx: arr[idx])
    samp_logits = jnp.concatenate(
        [take(logits, pos_idx), take(logits, neg_idx)], axis=1
    )
    samp_tgt = jnp.concatenate(
        [
            jnp.ones(pos_idx.shape, jnp.float32),
            jnp.zeros(neg_idx.shape, jnp.float32),
        ],
        axis=1,
    )
    samp_val = jnp.concatenate([pos_val, neg_val], axis=1)
    objectness = LS.masked_bce_with_logits(
        samp_logits, samp_tgt, samp_val
    ) * jnp.sum(samp_val) / (tcfg.rpn_batch_per_image * b)

    loc = LS.BOX_REG_LOSSES[tcfg.rpn_loss_type](
        take(deltas, pos_idx).astype(jnp.float32), gt_d,
        tcfg.rpn_smooth_l1_beta, arch.rpn_bbox_weights,
    )
    loc = jnp.sum(jnp.where(pos_val[..., None], loc, 0.0)) / (
        tcfg.rpn_batch_per_image * b
    )
    out = {"loss_rpn_cls": objectness, "loss_rpn_loc": loc}
    # Matcher overflow diagnostics (not losses — keys without the "loss"
    # prefix are excluded from the total and surfaced as metrics only).
    out.update({name: jnp.sum(v) for name, v in diag.items()})
    # Reference training diagnostics (rotated_rpn.py:52-57): sampled
    # positive/negative anchors per image.
    out["rpn/num_pos_anchors"] = jnp.sum(pos_val.astype(jnp.float32)) / b
    out["rpn/num_neg_anchors"] = jnp.sum(neg_val.astype(jnp.float32)) / b
    return out


def glass_train_forward(
    arch: GlassArch,
    tcfg: TrainConfig,
    params: dict,
    batch: dict,
    key: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], dict]:
    """Full training forward.

    batch fields (B leading):
        images (B, H, W, 3) raw BGR; content_hw (B, 2);
        gt_boxes (B, G, 5); gt_valid (B, G); gt_classes (B, G);
        gt_orientation (B, G); gt_text (B, G, T+2);
        gt_polygons (B, G, K, 2); gt_poly_nv (B, G).

    Returns (total_loss, loss_dict, bn_updates).
    """
    ctx = Ctx(train=True, axis_name=axis_name)
    b = batch["images"].shape[0]
    g = batch["gt_boxes"].shape[1]
    keys = jax.random.split(key, 8)

    norm = preprocess(arch, batch["images"])
    if arch.remat_backbone:
        # Rematerialize backbone activations in the backward pass; BN stat
        # updates come out as explicit outputs (side-effect-free under remat).
        def _bb(p, x):
            ctx2 = Ctx(train=True, axis_name=axis_name)
            f = backbone_features(ctx2, arch, p, x)
            return f, ctx2.bn_updates

        feats, bn_up = jax.checkpoint(_bb)(params, norm)
        ctx.bn_updates.update(bn_up)
    else:
        feats = backbone_features(ctx, arch, params, norm)

    # ---- RPN -----------------------------------------------------------
    rpn_features = [feats[f] for f in arch.rpn_in_features]
    logits_l, deltas_l = rpn_mod.rpn_head_apply(
        ctx, params["proposal_generator"]["rpn_head"], rpn_features
    )
    anchors_l = []
    level_specs = []
    for i, fname in enumerate(arch.rpn_in_features):
        stride = FPN_LEVEL_STRIDES[fname]
        h, w = rpn_features[i].shape[1], rpn_features[i].shape[2]
        cell = rpn_mod.generate_cell_anchors(
            arch.anchor_sizes[i], arch.anchor_aspects, arch.anchor_angles
        )
        level_specs.append((h, w, stride, cell, arch.anchor_offset))
        anchors_l.append(
            jnp.asarray(
                rpn_mod.generate_anchors_for_level(h, w, stride, cell, arch.anchor_offset)
            )
        )
    anchors = jnp.concatenate(anchors_l, axis=0)
    logits = jnp.concatenate([l.astype(jnp.float32) for l in logits_l], axis=1)
    # deltas stay in the head's compute dtype; consumers cast the few
    # gathered rows they use (sampled loss rows / top-k proposal rows)
    deltas = jnp.concatenate(deltas_l, axis=1)

    losses = rpn_losses(
        arch, tcfg, logits, deltas, anchors,
        batch["gt_boxes"], batch["gt_valid"], jax.random.split(keys[0], b),
        level_specs=tuple(level_specs),
    )

    # ---- proposals (stop-gradient, as in the reference) ----------------
    def proposals_per_image(logit_b, delta_b, hw):
        per_level_logits, per_level_deltas, off = [], [], 0
        for anc in anchors_l:
            n = anc.shape[0]
            per_level_logits.append(jax.lax.dynamic_slice_in_dim(logit_b, off, n))
            per_level_deltas.append(jax.lax.dynamic_slice_in_dim(delta_b, off, n))
            off += n
        return rpn_mod.select_proposals_single_image(
            per_level_logits,
            per_level_deltas,
            anchors_l,
            (hw[0], hw[1]),
            arch.rpn_bbox_weights,
            tcfg.rpn_pre_nms_topk,
            tcfg.rpn_post_nms_topk,
            arch.rpn_nms_thresh,
        )

    prop_boxes, prop_scores, prop_valid = jax.vmap(proposals_per_image)(
        jax.lax.stop_gradient(logits),
        jax.lax.stop_gradient(deltas),
        batch["content_hw"],
    )

    # Append gt to proposals (rotated_head.add_ground_truth_to_proposals).
    all_boxes = jnp.concatenate([prop_boxes, batch["gt_boxes"]], axis=1)
    all_valid = jnp.concatenate([prop_valid, batch["gt_valid"]], axis=1)

    # ---- ROI matching + sampling --------------------------------------
    def label_sample(boxes_b, valid_b, gt_b, gt_v, gt_cls, key):
        quality = pairwise_iou_rotated(gt_b, boxes_b)
        quality = quality * gt_v[:, None] * valid_b[None, :]
        matched_idx, match_labels = matcher_assign(
            quality, (tcfg.roi_iou_threshold,), (0, 1), allow_low_quality=False
        )
        cls = jnp.where(
            match_labels == 1, gt_cls[matched_idx], arch.num_classes
        )  # background = num_classes
        sample_labels = jnp.where(
            valid_b, jnp.where(cls < arch.num_classes, 1, 0), -1
        )
        pos_mask, neg_mask = subsample_labels(
            key, sample_labels, tcfg.roi_batch_per_image, tcfg.roi_positive_fraction
        )
        sampled_mask = pos_mask | neg_mask
        idx, sel_valid = _select_topk_mask(
            sampled_mask, tcfg.roi_batch_per_image,
            priority=-jnp.arange(sampled_mask.shape[0], dtype=jnp.float32),
        )
        return idx, sel_valid, matched_idx[idx], cls[idx]

    roi_keys = jax.random.split(keys[1], b)
    sel_idx, sel_valid, sel_gt_idx, sel_cls = jax.vmap(label_sample)(
        all_boxes, all_valid, batch["gt_boxes"], batch["gt_valid"],
        batch["gt_classes"], roi_keys,
    )

    take = jax.vmap(lambda arr, idx: arr[idx])
    sampled_boxes = take(all_boxes, sel_idx)  # (B, R, 5)
    gt_boxes_per = take(batch["gt_boxes"], sel_gt_idx)
    gt_orient_per = take(batch["gt_orientation"], sel_gt_idx)
    fg_mask = sel_valid & (sel_cls < arch.num_classes)

    # ---- box head ------------------------------------------------------
    r = tcfg.roi_batch_per_image
    pooled = jax.vmap(
        lambda f, bx: _multilevel_pool(
            arch,
            {k: v[None] for k, v in f.items()},
            arch.box_in_features,
            bx,
            (arch.box_pooler_resolution, arch.box_pooler_resolution),
            arch.box_pooler_sampling_ratio,
        )
    )({k: feats[k] for k in arch.box_in_features}, sampled_boxes)
    pooled = pooled.reshape(b * r, *pooled.shape[2:])
    x = bh.box_head_apply(ctx, params["roi_heads"]["box_head"], pooled)
    scores, pred_deltas, orient_logits = bh.box_predictor_apply(
        ctx, params["roi_heads"]["box_predictor"], x.astype(jnp.float32),
        arch.orientation_on,
    )

    flat_cls = sel_cls.reshape(-1)
    flat_valid = sel_valid.reshape(-1)
    flat_fg = fg_mask.reshape(-1)
    losses["loss_cls"] = LS.masked_cross_entropy(scores, flat_cls, flat_valid)

    # Reference training diagnostics: per-image sampled fg/bg proposal
    # counts (recognizers_hybrid_head.py:286-287) and the box-head accuracy
    # family (rotated_fast_rcnn.py:374-397 ``_log_accuracy``): argmax
    # accuracy over the sampled batch, fg-only accuracy, and fg rows
    # predicted as background.
    losses["roi_head/num_fg_samples"] = jnp.sum(flat_fg.astype(jnp.float32)) / b
    losses["roi_head/num_bg_samples"] = (
        jnp.sum((flat_valid & ~flat_fg).astype(jnp.float32)) / b
    )
    pred_cls = jnp.argmax(scores, axis=-1)
    bg_ind = scores.shape[-1] - 1
    num_inst = jnp.maximum(jnp.sum(flat_valid.astype(jnp.float32)), 1.0)
    num_fg = jnp.maximum(jnp.sum(flat_fg.astype(jnp.float32)), 1.0)
    losses["fast_rcnn/cls_accuracy"] = (
        jnp.sum(((pred_cls == flat_cls) & flat_valid).astype(jnp.float32)) / num_inst
    )
    losses["fast_rcnn/fg_cls_accuracy"] = (
        jnp.sum(((pred_cls == flat_cls) & flat_fg).astype(jnp.float32)) / num_fg
    )
    losses["fast_rcnn/false_negative"] = (
        jnp.sum(((pred_cls == bg_ind) & flat_fg).astype(jnp.float32)) / num_fg
    )

    gt_d = get_deltas(
        sampled_boxes.reshape(-1, 5), gt_boxes_per.reshape(-1, 5), arch.box_bbox_weights
    )
    reg = LS.BOX_REG_LOSSES[tcfg.box_loss_type](
        pred_deltas.reshape(-1, 5), gt_d, tcfg.box_smooth_l1_beta, arch.box_bbox_weights
    )
    total_sampled = jnp.maximum(jnp.sum(flat_valid), 1)
    losses["loss_box_reg"] = (
        jnp.sum(jnp.where(flat_fg[:, None], reg, 0.0)) / total_sampled
    )

    if arch.orientation_on:
        losses["loss_orientation"] = (
            LS.masked_cross_entropy(
                orient_logits, gt_orient_per.reshape(-1), flat_fg
            )
            * tcfg.orientation_loss_weight
        )

    # ---- gt-orientation overwrite for downstream branches --------------
    if tcfg.apply_orientation_in_training:
        ds_boxes = jax.vmap(overwrite_orientations_on_boxes)(
            sampled_boxes, gt_orient_per
        )
    else:
        ds_boxes = sampled_boxes

    # ---- recognizer branch --------------------------------------------
    if arch.recognizer_on:
        gt_text_per = take(batch["gt_text"], sel_gt_idx)  # (B, R, T+2)
        word_len = jnp.sum(gt_text_per > 0, axis=-1)
        # empty/ignored words encode to [GO][s] (token sum 1) in attention
        # mode, all zeros in ctc mode — exclude them either way
        empty_sum = 1 if arch.recognizer_decoder != "CTC" else 0
        word_ok = fg_mask & (jnp.sum(gt_text_per, axis=-1) > empty_sum)

        w_cap = tcfg.words_per_image
        wkeys = jax.random.split(keys[2], b)

        def select_words(ok, lens, key):
            k_strat, k_pick = jax.random.split(key)
            use_long = (
                jax.random.uniform(k_strat, ()) <= tcfg.sample_words_strategy_prob
            ) & (tcfg.sample_words_strategy == "long_first")
            rand_pri = jax.random.uniform(k_pick, ok.shape)
            pri = jnp.where(use_long, lens.astype(jnp.float32) + rand_pri * 0.01, rand_pri)
            return _select_topk_mask(ok, w_cap, priority=pri)

        w_idx, w_valid = jax.vmap(select_words)(word_ok, word_len, wkeys)
        word_boxes = take(ds_boxes, w_idx)  # (B, W, 5)
        word_text = take(gt_text_per, w_idx)  # (B, W, T+2)

        p2, p3 = feats["p2"], feats["p3"]
        fused = p2p3_fusion_apply(
            ctx, params["roi_heads"]["recognizer_feature_fusion"], p2, p3
        )
        from ..ops.roi_align_rotated import (
            roi_align_rotated,
            roi_align_rotated_adaptive,
        )

        # FeatPadV2 pads the GLOBAL pool boxes (aspect-preserving) + masks
        # the pooled features — at train time too, matching the reference's
        # pooler wrapping which is train/eval-symmetric
        # (recognizers_hybrid_head.py:464-471); raw-image crops stay
        # unpadded on both paths.
        if arch.pooler_pad == "FeatPadV2":
            from ..models.pooler_pad import feat_pad_v2_boxes

            pool_word_boxes, pad_ratio = jax.vmap(
                lambda bx: feat_pad_v2_boxes(bx, arch.recognizer_pool_hw)
            )(word_boxes)
        else:
            pool_word_boxes, pad_ratio = word_boxes, None
        global_f = jax.vmap(
            lambda fmap, bx: roi_align_rotated_adaptive(
                fmap, bx, arch.recognizer_pool_hw,
                spatial_scale=1.0 / FPN_LEVEL_STRIDES["p2"],
                max_sampling_ratio=arch.pool_max_sampling_ratio,
                bulk_sampling_ratio=arch.recognizer_pool_bulk_sampling_ratio,
                large_roi_budget=arch.pool_large_roi_budget,
            )
        )(fused, pool_word_boxes)
        if pad_ratio is not None:
            from ..models.pooler_pad import feat_pad_v2_mask

            global_f = jax.vmap(feat_pad_v2_mask)(global_f, pad_ratio)
        crops = jax.vmap(
            lambda img, bx: roi_align_rotated(
                img, bx, arch.img_crop_hw, spatial_scale=1.0,
                sampling_ratio=arch.img_crop_sampling_ratio,
                max_sampling_ratio=arch.crop_max_sampling_ratio,
            )
        )(norm, word_boxes)

        w = w_cap
        crops = crops.reshape(b * w, *crops.shape[2:])
        global_f = global_f.reshape(b * w, *global_f.shape[2:])
        local_f = local_extractor_forward(
            ctx, params["roi_heads"]["hybrid_net"]["ConvNet"], crops,
            arch.local_extractor_name,
        )
        fused_words = jnp.concatenate([local_f, global_f], axis=-1)
        from ..models.fusion import apply_fusion

        fused_words = apply_fusion(
            ctx, params["roi_heads"]["fusion_net"], fused_words,
            arch.fusion_name, arch.fusion_type, arch.gc_headers,
        )
        enc = recognizer_layers_apply(
            ctx, params["roi_heads"]["recognizer_head"], fused_words,
            arch.recognizer_backbone,
        )
        if arch.recognizer_decoder == "CTC":
            from ..models.recognizer import ctc_logits

            word_logits = ctc_logits(
                params["roi_heads"]["recognizer_head"]["decoder"],
                enc.astype(jnp.float32),
            )
            losses["loss_decoder"] = (
                LS.ctc_loss_masked(
                    word_logits, word_text.reshape(b * w, -1), w_valid.reshape(-1)
                )
                * tcfg.recognizer_loss_weight
            )
        else:
            word_logits = aster_decode_train(
                params["roi_heads"]["recognizer_head"]["decoder"],
                enc.astype(jnp.float32),
                word_text.reshape(b * w, -1),
                arch.max_word_len + 1,
            )
            losses["loss_decoder"] = (
                LS.decoder_cross_entropy(
                    word_logits, word_text.reshape(b * w, -1), w_valid.reshape(-1)
                )
                * tcfg.recognizer_loss_weight
            )

    # ---- mask branch ---------------------------------------------------
    if arch.mask_on and "gt_polygons" in batch:
        m_cap = tcfg.masks_per_image
        mkeys = jax.random.split(keys[3], b)
        m_idx, m_valid = jax.vmap(
            lambda ok, key: _select_topk_mask(ok, m_cap, key=key)
        )(fg_mask, mkeys)
        mask_boxes = take(ds_boxes, m_idx)  # (B, M, 5)
        mask_gt_idx = take(sel_gt_idx, m_idx)

        pooled_m = jax.vmap(
            lambda f, bx: _multilevel_pool(
                arch,
                {k: v[None] for k, v in f.items()},
                arch.box_in_features,
                bx,
                (arch.mask_pooler_resolution, arch.mask_pooler_resolution),
                0,
                bulk_sampling_ratio=arch.mask_pool_bulk_sampling_ratio,
            )
        )({k: feats[k] for k in arch.box_in_features}, mask_boxes)
        pooled_m = pooled_m.reshape(b * m_cap, *pooled_m.shape[2:])
        mask_logits = mask_head_apply(
            ctx, params["roi_heads"]["mask_head"], pooled_m, arch.mask_num_conv
        )[..., 0]

        targets = jax.vmap(
            lambda polys, nv, gidx, boxes: mask_targets_for_proposals(
                polys, nv, gidx, boxes, tcfg.mask_size
            )
        )(batch["gt_polygons"], batch["gt_poly_nv"], mask_gt_idx, mask_boxes)
        targets = targets.reshape(b * m_cap, tcfg.mask_size, tcfg.mask_size)
        elem_mask = jnp.broadcast_to(
            m_valid.reshape(-1)[:, None, None], targets.shape
        )
        losses["loss_mask"] = (
            LS.masked_bce_with_logits(
                mask_logits, targets.astype(jnp.float32), elem_mask
            )
            * tcfg.mask_loss_weight
        )

        # Reference training diagnostics (rotated_mask_head.py:384-396):
        # 0.5-threshold pixel accuracy / false-positive / false-negative
        # over the valid sampled instances.
        gt_bool = targets > 0.5
        incorrect = ((mask_logits > 0.0) != gt_bool) & elem_mask
        n_el = jnp.maximum(jnp.sum(elem_mask.astype(jnp.float32)), 1.0)
        n_pos = jnp.sum((gt_bool & elem_mask).astype(jnp.float32))
        losses["mask_rcnn/accuracy"] = (
            1.0 - jnp.sum(incorrect.astype(jnp.float32)) / n_el
        )
        losses["mask_rcnn/false_positive"] = jnp.sum(
            (incorrect & ~gt_bool).astype(jnp.float32)
        ) / jnp.maximum(n_el - n_pos, 1.0)
        losses["mask_rcnn/false_negative"] = jnp.sum(
            (incorrect & gt_bool).astype(jnp.float32)
        ) / jnp.maximum(n_pos, 1.0)

    # Diagnostic entries (matcher_*) ride along in the dict as metrics but
    # do not contribute to the optimized objective.
    total = sum(v for k, v in losses.items() if k.startswith("loss"))
    return total, losses, ctx.bn_updates
