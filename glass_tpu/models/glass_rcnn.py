"""GLASS R-CNN meta-architecture: the full image -> words path, one jit.

TPU-native re-design of the reference inference stack
(``GlassRCNN.inference``, reference ``glass/modeling/meta_arch/
glass_rcnn.py:57-101`` + ``MaskRotatedRecognizerHybridHead.forward``/
``forward_with_given_boxes``, ``recognizers_hybrid_head.py:136-181,571-609``):

    normalize -> ResNet50+FPN -> rotated RPN -> box head (+orientation)
    -> rotated NMS -> [P2P3 fusion + pooled global | raw-image crop ->
    local CNN] -> channel concat -> GCAttention -> CNN_V1_1 -> BiLSTM
    -> ASTER greedy decode  (+ optional mask head)

Everything runs under a single ``jax.jit`` per padded image bucket: the
dynamic collections of the reference (proposal lists, per-image detection
counts, word batches) are fixed-capacity padded arrays with validity masks.
The actual (unpadded) image extent is a dynamic argument used for clipping
and for masking anchors that the reference (which pads only to stride
divisibility) would never generate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from .context import Ctx
from .resnet import resnet50_apply, init_resnet50
from .fpn import fpn_apply, init_fpn, FPN_LEVEL_STRIDES
from . import rpn as rpn_mod
from . import box_head as bh
from .box_head import Detections
from .fusion import (
    p2p3_fusion_apply,
    gc_attention_apply,
    apply_fusion,
    init_p2p3_fusion,
    init_fusion,
)
from .local_extractor import local_extractor_forward, init_local_extractor_by_name
from .mask_head import mask_head_apply, mask_inference_probs, init_mask_head
from .recognizer import (
    recognizer_layers_apply,
    aster_decode_greedy,
    init_recognizer,
)
from ..ops.boxes import apply_deltas
from ..ops.roi_align_rotated import (
    roi_align_rotated,
    roi_align_rotated_adaptive,
    assign_boxes_to_levels,
)


@dataclass(frozen=True)
class GlassArch:
    """Static architecture hyperparameters (derived from a CfgNode)."""

    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    # RPN
    anchor_sizes: Tuple[Tuple[float, ...], ...] = ((16,), (32,), (64,), (128,), (256,))
    anchor_aspects: Tuple[float, ...] = (0.2, 0.5, 1.0)
    anchor_angles: Tuple[float, ...] = (-90, -45, 0, 45)
    anchor_offset: float = 0.0
    rpn_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    rpn_bbox_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 2.0)
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 100
    rpn_nms_thresh: float = 0.7
    # Box head
    box_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
    box_pooler_resolution: int = 7
    box_pooler_sampling_ratio: int = 2
    box_bbox_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0, 10.0)
    box_fc_dim: int = 2048
    num_classes: int = 1
    score_thresh: float = 0.05
    nms_thresh: float = 0.35
    detections_per_image: int = 100
    orientation_on: bool = True
    apply_orientation_to_boxes: bool = True
    # Recognizer
    recognizer_on: bool = True
    recognizer_in_features: Tuple[str, ...] = ("p2", "p3")
    recognizer_pool_hw: Tuple[int, int] = (8, 32)
    img_crop_hw: Tuple[int, int] = (128, 128)
    # d2's img_pooler uses a fixed 2x2 grid per output bin
    # (ROI_BOX_HEAD.POOLER_SAMPLING_RATIO=2); at 128x128 output the bins of
    # typical word crops are sub-pixel, so the extra samples are redundant.
    # 0 = adaptive ceil(extent/128) capped at crop_max_sampling_ratio —
    # identical to the fixed grid for boxes > 256 px and ~4x cheaper below.
    img_crop_sampling_ratio: int = 0
    crop_max_sampling_ratio: int = 2
    # "auto" | "pallas" | "xla" - see TPU.CROP_BACKEND / ops/pallas_crop.py.
    crop_backend: str = "auto"
    # adaptive-grid (sampling_ratio=0) pooler realisation — see
    # ops.roi_align_rotated_adaptive
    pool_max_sampling_ratio: int = 4
    pool_bulk_sampling_ratio: int = 2
    pool_large_roi_budget: int = 16
    # per-axis bulk grids (TPU.MASK_POOL_BULK_SAMPLING_RATIO /
    # TPU.RECOGNIZER_POOL_BULK_SAMPLING_RATIO): word-box statistics put
    # d2's adaptive grid at (1, 2) for the 14x14 mask pooler and (2, 1)
    # for the 8x32 recognizer pooler; matching bulk pairs + the large-roi
    # full-grid pass stay exact at half the gather/scatter cost
    mask_pool_bulk_sampling_ratio: tuple = (1, 2)
    recognizer_pool_bulk_sampling_ratio: tuple = (2, 1)
    max_word_len: int = 25
    vocab_size: int = 97
    gc_headers: int = 8
    pooler_pad: str = ""  # "" | "FeatPadV2"
    recognizer_backbone: str = "CNN_V1_1"
    # "ASTER" / "ASTER_V2" (attentional GRU) or "CTC" (per-timestep linear
    # head over the encoder sequence + CTC loss — an extension; the
    # reference ships ctc *decode* only, text_encoder.py:153-178)
    recognizer_decoder: str = "ASTER_V2"
    local_extractor_name: str = "ResNetFeatureExtractor"
    fusion_name: str = "MultiAspectGCAttention"
    fusion_type: str = "channel_add"
    # Mask
    mask_on: bool = True
    mask_inference: bool = False
    mask_pooler_resolution: int = 14
    mask_num_conv: int = 4
    # Backbone freezing (d2 MODEL.BACKBONE.FREEZE_AT: 1=stem, 2=+res2, ...;
    # GLASS configs set 0 = train everything).
    freeze_at: int = 0
    # Execution
    compute_dtype: str = "float32"
    remat_backbone: bool = False
    # Training-path stem conv formulation: "s2d4" (7x7/2 over a 4x4
    # space-to-depth grid — MXU-shaped contraction, measured 6.5 vs
    # 11.1 ms fwd+dW; records/stem_variants2_r5.log), "s2d" (2x2 grid),
    # or "plain" (direct conv). All bit-equivalent math.
    stem_backend: str = "s2d4"
    # Box/mask pooler kernel: "xla" (packed-pyramid gather, default) or
    # "pallas" (DMA-tile kernel, ops/pallas_roi_align.py — bit-exact,
    # measured slower on v5e; kept as the selectable alternative backend).
    roi_align_backend: str = "xla"
    # "topk": emit per-step argmax ids + max probs (12x smaller host fetch;
    # exactly what argmax decoding consumes). "probs": full (T, V)
    # distributions — required by weighted-edit-distance lexicon correction.
    text_emit: str = "topk"
    # fetch dtype for mask probabilities (thresholded at 0.5 downstream):
    # "float32"/"float16", or "uint8" = probs quantized to 1/255 steps on
    # device (halves the mask fetch bytes again vs f16; max |dprob| 0.002,
    # far inside the 0.5-threshold / paste-interpolation tolerance; the
    # runner dequantizes on host)
    mask_fetch_dtype: str = "float16"

    @classmethod
    def from_config(cls, cfg) -> "GlassArch":
        # Legacy checkpoints configure the recognizer through the
        # ROI_MASK_HEAD tree ("config duplication", reference
        # glass/config.py:125; RecognizerRCNNHeadV2 wiring).
        if cfg.MODEL.ROI_RECOGNIZER_HEAD.NAME == "RecognizerRCNNHeadV3":
            rec = cfg.MODEL.ROI_RECOGNIZER_HEAD
        else:
            rec = cfg.MODEL.ROI_MASK_HEAD
        # The static-shape inference path reads scores[:, 0] and runs one
        # class-agnostic NMS (box_head.py) — valid only for GLASS's single
        # 'word' class.  The reference does per-class NMS
        # (rotated_fast_rcnn.py:88-148); fail loudly rather than run a
        # silently-wrong multi-class mode.
        if cfg.MODEL.ROI_HEADS.NUM_CLASSES != 1:
            raise NotImplementedError(
                "glass_tpu supports NUM_CLASSES == 1 (the GLASS 'word' "
                f"class); got {cfg.MODEL.ROI_HEADS.NUM_CLASSES}. Per-class "
                "rotated NMS is not implemented."
            )
        # Decoder/codec consistency (ADVICE r2): with DECODER.NAME=CTC the
        # codec must be in ctc mode (vocab = charset + [blank]) and vice
        # versa — a mismatch shifts the vocabulary and silently corrupts
        # both training targets and decoding.
        decoder_name = rec.RECOGNIZER_HEAD.DECODER.NAME
        if cfg.MODEL.RECOGNIZER_ON and (
            (decoder_name == "CTC") != (rec.LABELS_TYPE == "ctc")
        ):
            raise ValueError(
                "Inconsistent recognizer config: RECOGNIZER_HEAD.DECODER."
                f"NAME={decoder_name!r} requires LABELS_TYPE="
                f"{'ctc' if decoder_name == 'CTC' else 'attention'!r}, got "
                f"LABELS_TYPE={rec.LABELS_TYPE!r} (vocab layouts differ: "
                "attention adds [GO],[s]; ctc adds [blank])."
            )
        # Local-extractor / pooler shape contract (ADVICE r2):
        # ResNetFeatureExtractorV2 downsamples the crop 4x on both axes, so
        # the recognizer concat only works when the global pool resolution
        # equals crop/4 (the default V1 extractor emits crop/16 x crop/4 =
        # the 8x32 global pool).
        if cfg.MODEL.RECOGNIZER_ON and (
            cfg.MODEL.LOCAL_FEATURE_EXTRACTOR.NAME == "ResNetFeatureExtractorV2"
        ):
            crop_hw = (
                rec.POOLER_RESOLUTION_HEIGHT * 16,
                rec.POOLER_RESOLUTION_WIDTH * 4,
            )
            v2_out = (crop_hw[0] // 4, crop_hw[1] // 4)
            pool_hw = (rec.POOLER_RESOLUTION_HEIGHT, rec.POOLER_RESOLUTION_WIDTH)
            if v2_out != pool_hw:
                raise ValueError(
                    "ResNetFeatureExtractorV2 emits a crop/4 feature map "
                    f"({v2_out[0]}x{v2_out[1]} from the {crop_hw[0]}x"
                    f"{crop_hw[1]} crop) but the recognizer concatenates it "
                    f"with the {pool_hw[0]}x{pool_hw[1]} global pool; set "
                    "POOLER_RESOLUTION_HEIGHT/WIDTH so crop/4 matches the "
                    "pool (e.g. the default extractor instead, which emits "
                    "crop/16 x crop/4)."
                )
        def _grid(v):
            # int-or-(h, w) bulk-grid configs; tuples for jit-static hashing
            return tuple(v) if isinstance(v, (tuple, list)) else v

        return cls(
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
            anchor_aspects=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
            anchor_angles=tuple(cfg.MODEL.ANCHOR_GENERATOR.ANGLES[0]),
            anchor_offset=cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
            rpn_in_features=tuple(cfg.MODEL.RPN.IN_FEATURES),
            rpn_bbox_weights=tuple(cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
            rpn_pre_nms_topk=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            rpn_post_nms_topk=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            box_in_features=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
            box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            box_pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            box_bbox_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            box_fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            orientation_on=cfg.MODEL.ORIENTATION_ON,
            apply_orientation_to_boxes=cfg.MODEL.ROI_ORIENTATION_HEAD.APPLY_TO_BOXES,
            recognizer_on=cfg.MODEL.RECOGNIZER_ON,
            recognizer_in_features=tuple(rec.IN_FEATURES),
            recognizer_pool_hw=(rec.POOLER_RESOLUTION_HEIGHT, rec.POOLER_RESOLUTION_WIDTH),
            img_crop_hw=(rec.POOLER_RESOLUTION_HEIGHT * 16, rec.POOLER_RESOLUTION_WIDTH * 4),
            img_crop_sampling_ratio=cfg.TPU.CROP_SAMPLING_RATIO,
            crop_max_sampling_ratio=cfg.TPU.CROP_MAX_SAMPLING_RATIO,
            crop_backend=cfg.TPU.CROP_BACKEND,
            pool_max_sampling_ratio=cfg.TPU.POOL_MAX_SAMPLING_RATIO,
            pool_bulk_sampling_ratio=cfg.TPU.POOL_BULK_SAMPLING_RATIO,
            pool_large_roi_budget=cfg.TPU.POOL_LARGE_ROI_BUDGET,
            mask_pool_bulk_sampling_ratio=_grid(
                cfg.TPU.MASK_POOL_BULK_SAMPLING_RATIO
            ),
            recognizer_pool_bulk_sampling_ratio=_grid(
                cfg.TPU.RECOGNIZER_POOL_BULK_SAMPLING_RATIO
            ),
            max_word_len=rec.MAX_WORD_LENGTH,
            # attention adds [GO],[s]; ctc adds [blank] (text/codec.py)
            vocab_size=len(rec.CHARACTER_SET)
            + (2 if rec.LABELS_TYPE == "attention" else 1),
            gc_headers=cfg.MODEL.HYBRID_FUSION.HEADERS,
            pooler_pad=rec.RECOGNIZER_HEAD.POOLER_PAD.NAME,
            recognizer_backbone=rec.RECOGNIZER_HEAD.BACKBONE.NAME,
            recognizer_decoder=rec.RECOGNIZER_HEAD.DECODER.NAME,
            local_extractor_name=cfg.MODEL.LOCAL_FEATURE_EXTRACTOR.NAME,
            fusion_name=cfg.MODEL.HYBRID_FUSION.NAME,
            fusion_type=cfg.MODEL.HYBRID_FUSION.FUSION_TYPE,
            mask_on=cfg.MODEL.MASK_ON,
            mask_inference=cfg.MODEL.ROI_MASK_HEAD.MASK_INFERENCE,
            mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
            mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            remat_backbone=cfg.TPU.REMAT_BACKBONE,
            stem_backend=str(getattr(cfg.TPU, "STEM_BACKEND", "s2d4")),
            roi_align_backend=cfg.TPU.ROI_ALIGN_BACKEND,
            text_emit=cfg.TPU.TEXT_EMIT,
            mask_fetch_dtype=cfg.TPU.MASK_FETCH_DTYPE,
        )


def init_glass_params(key, arch: GlassArch) -> dict:
    """Random-init the full parameter tree (d2-compatible layout)."""
    ks = jax.random.split(key, 12)
    num_anchors = len(arch.anchor_aspects) * len(arch.anchor_angles) * len(arch.anchor_sizes[0])
    pooled_feat = 256 * arch.box_pooler_resolution**2
    params = {
        "backbone": {
            "bottom_up": init_resnet50(ks[0]),
            **init_fpn(ks[1]),
        },
        "proposal_generator": {
            "rpn_head": rpn_mod.init_rpn_head(ks[2], 256, num_anchors)
        },
        "roi_heads": {
            "box_head": bh.init_box_head(ks[3], pooled_feat, arch.box_fc_dim),
            "box_predictor": bh.init_box_predictor(
                ks[4], arch.box_fc_dim, arch.num_classes, arch.orientation_on
            ),
        },
    }
    if arch.recognizer_on:
        params["roi_heads"]["recognizer_feature_fusion"] = init_p2p3_fusion(ks[5])
        params["roi_heads"]["hybrid_net"] = {
            "ConvNet": init_local_extractor_by_name(ks[6], arch.local_extractor_name)
        }
        params["roi_heads"]["fusion_net"] = init_fusion(
            ks[7], name=arch.fusion_name, fusion_type=arch.fusion_type,
            inplanes=512, headers=arch.gc_headers,
        )
        params["roi_heads"]["recognizer_head"] = init_recognizer(
            ks[8], channels=256, vocab=arch.vocab_size,
            decoder=arch.recognizer_decoder,
        )
    if arch.mask_on:
        params["roi_heads"]["mask_head"] = init_mask_head(
            ks[9], num_conv=arch.mask_num_conv, num_classes=arch.num_classes
        )
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def preprocess(arch: GlassArch, image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) raw (BGR, 0-255) -> normalized, cast to compute dtype."""
    mean = jnp.asarray(arch.pixel_mean, jnp.float32)
    std = jnp.asarray(arch.pixel_std, jnp.float32)
    out = (image.astype(jnp.float32) - mean) / std
    return out.astype(arch.compute_dtype)


def backbone_features(
    ctx: Ctx, arch: GlassArch, params: dict, images: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """images (N, H, W, 3) normalized -> {p2..p6} NHWC."""
    bu = resnet50_apply(
        ctx, params["backbone"]["bottom_up"], images, freeze_at=arch.freeze_at,
        stem_backend=arch.stem_backend,
    )
    return fpn_apply(ctx, params["backbone"], bu)


def rpn_proposals_single(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    content_hw: jnp.ndarray,
    train: bool = False,
):
    """Single-image (leading dim 1 features) proposal generation.

    content_hw: (2,) dynamic actual image extent (pre-padding).
    Returns (boxes (P,5), scores (P,), valid (P,)).
    """
    features = [feats[f] for f in arch.rpn_in_features]
    logits, deltas = rpn_mod.rpn_head_apply(
        ctx, params["proposal_generator"]["rpn_head"], features
    )
    cell = rpn_mod.generate_cell_anchors(
        arch.anchor_sizes[0], arch.anchor_aspects, arch.anchor_angles
    )
    anchors, masked_logits = [], []
    # The reference pads only to stride divisibility; mask anchors whose
    # centers fall outside that extent so bucket padding cannot add
    # proposals the reference would never see.
    max_h = jnp.ceil(content_hw[0] / 32.0) * 32.0
    max_w = jnp.ceil(content_hw[1] / 32.0) * 32.0
    for i, fname in enumerate(arch.rpn_in_features):
        stride = FPN_LEVEL_STRIDES[fname]
        h, w = features[i].shape[1], features[i].shape[2]
        cell_l = rpn_mod.generate_cell_anchors(
            arch.anchor_sizes[i], arch.anchor_aspects, arch.anchor_angles
        )
        anc = rpn_mod.generate_anchors_for_level(h, w, stride, cell_l, arch.anchor_offset)
        anc = jnp.asarray(anc)
        inside = (anc[:, 0] < max_w) & (anc[:, 1] < max_h)
        anchors.append(anc)
        lg = logits[i][0].astype(jnp.float32)
        masked_logits.append(jnp.where(inside, lg, rpn_mod.NEG_INF))

    pre = arch.rpn_pre_nms_topk
    post = arch.rpn_post_nms_topk
    return rpn_mod.select_proposals_single_image(
        masked_logits,
        # bf16 here on purpose: only the top-k rows are decoded, and
        # select_proposals casts AFTER its gather — converting all 706k
        # anchor deltas to f32 first measured 1.15 ms/frame (trace).
        [d[0] for d in deltas],
        anchors,
        (content_hw[0], content_hw[1]),
        arch.rpn_bbox_weights,
        pre,
        post,
        arch.rpn_nms_thresh,
    )


def _multilevel_pool(
    arch: GlassArch,
    feats: Dict[str, jnp.ndarray],
    in_features: Tuple[str, ...],
    rois: jnp.ndarray,
    out_hw: Tuple[int, int],
    sampling_ratio: int,
    bulk_sampling_ratio: int | None = None,
) -> jnp.ndarray:
    """detectron2 multi-level ROIPooler over single-image features.

    Uses the packed-pyramid formulation (each roi gathers only from its
    assigned level) — see ``ops.multilevel_roi_align_rotated_packed``.
    """
    strides = [FPN_LEVEL_STRIDES[f] for f in in_features]
    if arch.roi_align_backend == "pallas":
        from ..ops.roi_align_rotated import multilevel_roi_align_rotated_pallas

        return multilevel_roi_align_rotated_pallas(
            [feats[f][0] for f in in_features],
            rois,
            out_hw,
            strides,
            sampling_ratio=sampling_ratio,
            max_sampling_ratio=arch.pool_max_sampling_ratio,
        )
    from ..ops.roi_align_rotated import multilevel_roi_align_rotated_packed

    return multilevel_roi_align_rotated_packed(
        [feats[f][0] for f in in_features],
        rois,
        out_hw,
        strides,
        sampling_ratio=sampling_ratio,
        max_sampling_ratio=arch.pool_max_sampling_ratio,
        bulk_sampling_ratio=(
            arch.pool_bulk_sampling_ratio
            if bulk_sampling_ratio is None
            else bulk_sampling_ratio
        ),
        large_roi_budget=arch.pool_large_roi_budget,
    )


def box_head_predictions(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    proposals: jnp.ndarray,
):
    pooled = _multilevel_pool(
        arch,
        feats,
        arch.box_in_features,
        proposals,
        (arch.box_pooler_resolution, arch.box_pooler_resolution),
        arch.box_pooler_sampling_ratio,
    )
    x = bh.box_head_apply(ctx, params["roi_heads"]["box_head"], pooled)
    return bh.box_predictor_apply(
        ctx, params["roi_heads"]["box_predictor"], x.astype(jnp.float32), arch.orientation_on
    )


def detect_single_image(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    content_hw: jnp.ndarray,
) -> Detections:
    """RPN + box head + NMS for one (padded) image."""
    prop_boxes, prop_scores, prop_valid = rpn_proposals_single(
        ctx, arch, params, feats, content_hw
    )
    scores, deltas, orient = box_head_predictions(ctx, arch, params, feats, prop_boxes)
    probs = jax.nn.softmax(scores, axis=-1)
    boxes = apply_deltas(deltas, prop_boxes, arch.box_bbox_weights)
    return bh.fast_rcnn_inference_single_image(
        boxes,
        probs,
        orient,
        prop_valid,
        (content_hw[0], content_hw[1]),
        arch.score_thresh,
        arch.nms_thresh,
        arch.detections_per_image,
        arch.apply_orientation_to_boxes and arch.orientation_on,
    )


def resolved_crop_backend(
    arch: GlassArch, image_hw, train: bool, raw_uint8: bool
) -> str:
    """Which raw-image crop gather the TPU.CROP_BACKEND rule picks at these
    shapes — "pallas" (tile-DMA kernel), "xla_u8" (uint8-packed gather with
    normalization folded in) or "xla" (row gather on the normalized image).

    The auto rule resolves to the XLA gather everywhere: the round-4
    on-chip frame A/B measured the Pallas tile-DMA kernel SLOWER as a
    frame (46.6 vs 38.7 ms/frame, serve_ab_r4.log) despite winning
    standalone (2.5 vs 5.5 ms) — inside the frame the gather overlaps
    neighbouring ops while the Mosaic kernel serializes.  "pallas" stays
    available as an explicit opt-in at the shapes it supports.  Exposed
    so bench.py can record backend provenance with its numbers.
    """
    use_pallas = (
        arch.crop_backend == "pallas"
        and not train
        and arch.img_crop_sampling_ratio == 1
        and tuple(arch.img_crop_hw) == (128, 128)
        and image_hw[0] >= 136
        and image_hw[1] >= 256
    )
    if use_pallas:
        return "pallas"
    return "xla_u8" if raw_uint8 else "xla"


def recognizer_encode(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    norm_image: jnp.ndarray,
    boxes: jnp.ndarray,
    raw_image: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The GLASS fusion hot path up to the encoder sequence (reference call
    stack 3.4 minus the decoder): P2P3 fusion -> global pool + raw-image
    crops -> local CNN -> GC-attention fusion -> recognizer CNN -> BiLSTM.

    norm_image: (H, W, 3) normalized padded image; boxes (D, 5).
    raw_image: optional (H, W, 3) uint8 original — when given, the raw
        crops are pooled straight from it with the normalization folded in
        (half the gather elements of the packed-bf16 path; see
        ``ops.roi_align_rotated``).
    Returns encoder outputs (D, T, C).
    """
    rh = params["roi_heads"]
    p2, p3 = feats["p2"], feats["p3"]
    fused = p2p3_fusion_apply(ctx, rh["recognizer_feature_fusion"], p2, p3)[0]

    pool_hw = arch.recognizer_pool_hw
    if arch.pooler_pad == "FeatPadV2":
        from .pooler_pad import feat_pad_v2_boxes, feat_pad_v2_mask

        pool_boxes, pad_ratio = feat_pad_v2_boxes(boxes, pool_hw)
    else:
        pool_boxes, pad_ratio = boxes, None
    # packed_taps measured slower here (256-ch rows are bandwidth-bound:
    # 4x bytes/row outweighs 4x fewer rows) — default row gathers win.
    global_feats = roi_align_rotated_adaptive(
        fused, pool_boxes, pool_hw, spatial_scale=1.0 / FPN_LEVEL_STRIDES["p2"],
        max_sampling_ratio=arch.pool_max_sampling_ratio,
        bulk_sampling_ratio=arch.recognizer_pool_bulk_sampling_ratio,
        large_roi_budget=arch.pool_large_roi_budget,
    )
    if pad_ratio is not None:
        from .pooler_pad import feat_pad_v2_mask

        global_feats = feat_pad_v2_mask(global_feats, pad_ratio)
    backend = resolved_crop_backend(
        arch,
        norm_image.shape[:2],
        train=ctx.train,
        raw_uint8=raw_image is not None and raw_image.dtype == jnp.uint8,
    )
    if backend == "pallas":
        from ..ops.pallas_crop import crop_rois_pallas

        crops = crop_rois_pallas(
            norm_image, boxes, arch.img_crop_hw,
            # forced-"pallas" runs off-TPU (tests, CPU parity) go through the
            # interpreter; Mosaic lowering is TPU-only.
            interpret=jax.default_backend() != "tpu",
        ).astype(arch.compute_dtype)
    elif backend == "xla_u8":
        crops = roi_align_rotated(
            raw_image, boxes, arch.img_crop_hw, spatial_scale=1.0,
            sampling_ratio=arch.img_crop_sampling_ratio,
            max_sampling_ratio=arch.crop_max_sampling_ratio,
            normalize=(
                jnp.asarray(arch.pixel_mean, jnp.float32),
                jnp.asarray(arch.pixel_std, jnp.float32),
            ),
        ).astype(arch.compute_dtype)
    else:
        crops = roi_align_rotated(
            norm_image, boxes, arch.img_crop_hw, spatial_scale=1.0,
            sampling_ratio=arch.img_crop_sampling_ratio,
            max_sampling_ratio=arch.crop_max_sampling_ratio,
        )
    local_feats = local_extractor_forward(
        ctx, rh["hybrid_net"]["ConvNet"], crops, arch.local_extractor_name
    )
    x = jnp.concatenate([local_feats, global_feats], axis=-1)
    x = apply_fusion(
        ctx, rh["fusion_net"], x, arch.fusion_name, arch.fusion_type, arch.gc_headers
    )
    return recognizer_layers_apply(
        ctx, rh["recognizer_head"], x, arch.recognizer_backbone
    )


def recognize_single_image(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    norm_image: jnp.ndarray,
    boxes: jnp.ndarray,
    raw_image: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``recognizer_encode`` + the decoder: (D, max_word_len + 1, V)
    per-step char probabilities (CTC: (D, T, V) per-timestep probs)."""
    enc = recognizer_encode(
        ctx, arch, params, feats, norm_image, boxes, raw_image=raw_image
    )
    rh = params["roi_heads"]
    if arch.recognizer_decoder == "CTC":
        from .recognizer import ctc_logits

        return jax.nn.softmax(
            ctc_logits(rh["recognizer_head"]["decoder"], enc.astype(jnp.float32)),
            axis=-1,
        )  # (D, T=32, V); codec._decode_ctc collapses repeats/blanks
    return aster_decode_greedy(
        rh["recognizer_head"]["decoder"], enc.astype(jnp.float32), arch.max_word_len + 1
    )


def mask_single_image(
    ctx: Ctx,
    arch: GlassArch,
    params: dict,
    feats: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    classes: jnp.ndarray,
) -> jnp.ndarray:
    # sampling_ratio=0 is adaptive ceil(roi_extent/14) CAPPED at 4 samples/bin
    # (ops/roi_align_rotated.py max_sampling_ratio), where detectron2's
    # adaptive grid is unbounded: rois much larger than their level's
    # canonical size (only possible at the clamped top level, P5) are sampled
    # on a coarser grid than the reference.  At 14x14 output the cap binds
    # for rois > 4x canonical (>2048 px on P5); mask AP impact is nil in
    # practice, and the cap is what keeps the gather shape static.
    pooled = _multilevel_pool(
        arch,
        feats,
        arch.box_in_features,
        boxes,
        (arch.mask_pooler_resolution, arch.mask_pooler_resolution),
        0,
        bulk_sampling_ratio=arch.mask_pool_bulk_sampling_ratio,
    )
    logits = mask_head_apply(
        ctx, params["roi_heads"]["mask_head"], pooled, arch.mask_num_conv
    )
    return mask_inference_probs(logits.astype(jnp.float32), classes)


def glass_inference_single(
    arch: GlassArch,
    params: dict,
    image: jnp.ndarray,
    content_hw: jnp.ndarray,
) -> dict:
    """Full single-image inference (jit this, static over padded shape).

    Args:
        image: (H_pad, W_pad, 3) raw BGR float image (content top-left).
        content_hw: (2,) int32 actual content extent.

    Returns dict with fixed-shape fields:
        boxes (D,5), scores (D,), orientations (D,2), valid (D,),
        text_probs (D, T, V), mask_probs (D, 28, 28) [if mask_inference].
    """
    ctx = Ctx(train=False)
    norm = preprocess(arch, image)
    feats = backbone_features(ctx, arch, params, norm[None])
    det = detect_single_image(ctx, arch, params, feats, content_hw)
    out = {
        "boxes": det.boxes,
        "scores": det.scores,
        "classes": det.classes,
        "orientations": det.orientations,
        "valid": det.valid,
    }
    if arch.recognizer_on:
        # uint8 upload: gather crops from the raw image (normalization
        # folded, f32-exact) only when computing in f32 — it is the
        # precision-faithful path but its 3-word rows sit below the
        # per-row gather floor (device-trace: 7.2 ms vs 5.5 ms for the
        # bf16-pair packed gather from the already-normalized image).
        # Under bf16 compute the crops get quantized to bf16 anyway, so
        # route through the normalized image and take the faster gather.
        # NB: compute_dtype is a string config value — compare through
        # jnp.dtype (a bare `== jnp.float32` silently never matches).
        use_raw = (
            image.dtype == jnp.uint8
            and jnp.dtype(arch.compute_dtype) == jnp.float32
        )
        probs = recognize_single_image(
            ctx, arch, params, feats, norm, det.boxes,
            raw_image=image if use_raw else None,
        )
        out.update(emit_text(arch, probs))
    if arch.mask_on and arch.mask_inference:
        out["mask_probs"] = emit_mask(
            arch, mask_single_image(ctx, arch, params, feats, det.boxes, det.classes)
        )
    return out


def emit_mask(arch: GlassArch, probs: jnp.ndarray) -> jnp.ndarray:
    """Host-fetch representation of mask probabilities (TPU.MASK_FETCH_DTYPE).

    ``uint8`` quantizes probs to 1/255 steps on device — the consumer is a
    0.5 threshold after bilinear paste (reference ``mask_ops.py`` semantics),
    so the 0.002 quantization error is inert; the runner dequantizes."""
    if arch.mask_fetch_dtype == "uint8":
        return jnp.round(probs * 255.0).astype(jnp.uint8)
    if arch.mask_fetch_dtype not in ("float32", "float16"):
        raise ValueError(
            f"TPU.MASK_FETCH_DTYPE={arch.mask_fetch_dtype!r} is not supported: "
            "expected one of 'float32', 'float16', 'uint8'"
        )
    return probs.astype(arch.mask_fetch_dtype)


_emit_mask = emit_mask  # back-compat alias


def emit_text(arch: GlassArch, probs: jnp.ndarray) -> dict:
    """Host-fetch representation of the recognizer output.

    The argmax decoding of the reference (``text_evaluator.
    get_instances_text``) only consumes per-step argmax ids and max probs, so
    the default "topk" mode computes those on device — 12x less host
    traffic than the full (D, T, V) tensor.  "probs" keeps the full
    distributions (needed by weighted-edit-distance lexicon correction,
    reference ``lexicon_utils.py:136-181``).
    """
    if arch.text_emit == "topk":
        return {
            "text_ids": jnp.argmax(probs, axis=-1).astype(jnp.int32),
            "text_step_scores": jnp.max(probs, axis=-1),
        }
    return {"text_probs": probs}


def glass_detect_stage(arch: GlassArch, params: dict, image: jnp.ndarray,
                       content_hw: jnp.ndarray):
    """Stage 1 of two-stage inference: detection only; features stay on
    device for stage 2."""
    ctx = Ctx(train=False)
    norm = preprocess(arch, image)
    feats = backbone_features(ctx, arch, params, norm[None])
    det = detect_single_image(ctx, arch, params, feats, content_hw)
    return {
        "boxes": det.boxes,
        "scores": det.scores,
        "classes": det.classes,
        "orientations": det.orientations,
        "valid": det.valid,
    }, feats, norm


def glass_heads_stage(arch: GlassArch, params: dict, feats, norm: jnp.ndarray,
                      boxes: jnp.ndarray,
                      raw_image: jnp.ndarray | None = None) -> dict:
    """Stage 2: recognizer (+mask) on a word-bucketed box set."""
    ctx = Ctx(train=False)
    out = {}
    if arch.recognizer_on:
        probs = recognize_single_image(
            ctx, arch, params, feats, norm, boxes, raw_image=raw_image
        )
        out.update(emit_text(arch, probs))
    if arch.mask_on and arch.mask_inference:
        out["mask_probs"] = emit_mask(
            arch,
            mask_single_image(
                ctx, arch, params, feats, boxes,
                jnp.zeros((boxes.shape[0],), jnp.int32),
            ),
        )
    return out


def make_inference_fn(arch: GlassArch):
    """Returns jit-compiled single-image inference (donated image buffer)."""
    return jax.jit(partial(glass_inference_single, arch))
