#!/usr/bin/env python
"""Per-component device-time breakdown of the inference path.

Each micro-benchmark is ONE jit program containing a dependency-chained
``lax.fori_loop`` of K repetitions, so a single dispatch + single fetch
measures K executions — immune to the tunnel's ~3 ms dispatch / ~30 ms
fetch overhead (see PERF_NOTES.md).

Usage: python tools/profile_breakdown.py [component ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from glass_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


K = int(os.environ.get("GLASS_PROFILE_K", "30"))  # in-graph reps per program


def timed(name, build):
    """build() -> (fn, args). fn must chain K reps internally."""
    fn, args = build()
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # warmup + compile
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:34s} {dt:8.3f} ms", flush=True)
    return dt


def chain_loop(op, x0):
    """Repeat op K times with a scalar data dependency between iterations."""

    def body(i, carry):
        acc, x = carry
        r = op(x + acc * 1e-12)
        return acc + r, x

    def fn(x):
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x))
        return acc

    return jax.jit(fn), (x0,)


# ---- component builders ----------------------------------------------------

rng = np.random.RandomState(0)

# Anchor counts at the 736x1280 eval resolution, A=12.
LEVEL_SIZES = {"p2": (184, 320), "p3": (92, 160), "p4": (46, 80),
               "p5": (23, 40), "p6": (12, 20)}
A = 12


def build_topk_p2():
    n = 184 * 320 * A
    x0 = jnp.asarray(rng.randn(n).astype(np.float32))
    return chain_loop(lambda x: jax.lax.top_k(x, 1000)[0].sum(), x0)


def build_topk_all5():
    xs = tuple(
        jnp.asarray(rng.randn(h * w * A).astype(np.float32))
        for h, w in LEVEL_SIZES.values()
    )

    def op(xs_shifted):
        return sum(jax.lax.top_k(x, min(1000, x.shape[0]))[0].sum() for x in xs_shifted)

    def body(i, carry):
        acc, xs_ = carry
        r = op(tuple(x + acc * 1e-12 for x in xs_))
        return acc + r, xs_

    def fn(*xs_):
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), xs_))
        return acc

    return jax.jit(fn), xs


def build_approx_topk_p2():
    n = 184 * 320 * A
    x0 = jnp.asarray(rng.randn(n).astype(np.float32))
    return chain_loop(
        lambda x: jax.lax.approx_max_k(x, 1000, recall_target=0.95)[0].sum(), x0
    )


def _rand_boxes(n):
    b = np.zeros((n, 5), np.float32)
    b[:, 0] = rng.uniform(0, 1280, n)
    b[:, 1] = rng.uniform(0, 736, n)
    b[:, 2] = rng.uniform(8, 160, n)
    b[:, 3] = rng.uniform(8, 60, n)
    b[:, 4] = rng.uniform(-90, 90, n)
    return b


def _build_nms(n):
    from glass_tpu.ops.nms_rotated import nms_rotated_mask

    boxes = jnp.asarray(_rand_boxes(n))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))

    def body(i, carry):
        acc, b, s = carry
        keep = nms_rotated_mask(b + acc * 1e-12, s, 0.7)
        return acc + keep.sum().astype(jnp.float32), b, s

    def fn(b, s):
        acc, _, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), b, s))
        return acc

    return jax.jit(fn), (boxes, scores)


def build_nms1000():
    return _build_nms(1000)


def build_nms512():
    return _build_nms(512)


def build_nms256():
    return _build_nms(256)


def build_iou1000():
    from glass_tpu.ops.iou_rotated import pairwise_iou_rotated

    boxes = jnp.asarray(_rand_boxes(1000))

    def body(i, carry):
        acc, b = carry
        iou = pairwise_iou_rotated(b + acc * 1e-12, b)
        return acc + iou.sum(), b

    def fn(b):
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), b))
        return acc

    return jax.jit(fn), (boxes,)


def build_select_proposals():
    """The full RPN proposal selection at eval shapes (one image)."""
    from glass_tpu.models import rpn as rpn_mod
    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch

    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    arch = GlassArch.from_config(cfg)

    logits, deltas, anchors = [], [], []
    for i, ((lvl, (h, w)), stride) in enumerate(
        zip(LEVEL_SIZES.items(), (4, 8, 16, 32, 64))
    ):
        n = h * w * A
        logits.append(jnp.asarray(rng.randn(n).astype(np.float32)))
        deltas.append(jnp.asarray(0.1 * rng.randn(n, 5).astype(np.float32)))
        cell = rpn_mod.generate_cell_anchors(
            arch.anchor_sizes[i], arch.anchor_aspects, arch.anchor_angles
        )
        anchors.append(jnp.asarray(rpn_mod.generate_anchors_for_level(
            h, w, stride, cell, arch.anchor_offset
        )))

    def body(i, carry):
        acc, lg = carry
        lg2 = [l + acc * 1e-12 for l in lg]
        boxes, scores, valid = rpn_mod.select_proposals_single_image(
            lg2, deltas, anchors, (736, 1280), arch.rpn_bbox_weights,
            arch.rpn_pre_nms_topk, arch.rpn_post_nms_topk, arch.rpn_nms_thresh,
        )
        return acc + scores.sum() + boxes.sum(), lg

    def fn(*lg):
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), list(lg)))
        return acc

    return jax.jit(fn), tuple(logits)


# ---- model-stage benchmarks (real arch + params, eval shapes) --------------

_MODEL_STATE = {}


def _model_state():
    if _MODEL_STATE:
        return _MODEL_STATE
    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.models import glass_rcnn as G

    cfg = get_cfg(os.path.join(os.path.dirname(__file__), "..", "configs",
                               "glass_finetune_icdar15.yaml"))
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    arch = GlassArch.from_config(cfg)
    params = init_glass_params(jax.random.PRNGKey(0), arch)
    image = jnp.asarray(rng.rand(736, 1280, 3).astype(np.float32) * 255)
    content_hw = jnp.asarray([720, 1280], np.int32)
    ctx = G.Ctx(train=False)
    norm = G.preprocess(arch, image)
    feats = jax.jit(lambda p, n: G.backbone_features(G.Ctx(train=False), arch, p, n[None]))(
        params, norm
    )
    boxes = jnp.asarray(_rand_boxes(arch.detections_per_image))
    _MODEL_STATE.update(dict(arch=arch, params=params, image=image, norm=norm,
                             content_hw=content_hw, feats=feats, boxes=boxes,
                             G=G, ctx=ctx))
    return _MODEL_STATE


def _stage_loop(stage_fn, perturb_arg, args):
    """Chain K stage invocations by perturbing one array arg with the acc."""

    def body(i, carry):
        acc, a = carry
        out = stage_fn(*[x if j != perturb_arg else x + acc * 1e-12
                         for j, x in enumerate(a)])
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return acc + s, a

    def fn(*a):
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), a))
        return acc

    return jax.jit(fn), args


def build_stage_backbone():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    return _stage_loop(
        lambda img: G.backbone_features(
            G.Ctx(train=False), arch, s["params"], G.preprocess(arch, img)[None]
        ),
        0, (s["image"],),
    )


def build_stage_detect():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    flat, tree = jax.tree_util.tree_flatten(s["feats"])

    def stage(f0, *rest):
        feats = jax.tree_util.tree_unflatten(tree, [f0, *rest])
        return G.detect_single_image(G.Ctx(train=False), arch, s["params"],
                                     feats, s["content_hw"])

    return _stage_loop(stage, 0, tuple(flat))


def build_stage_recognize():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    flat, tree = jax.tree_util.tree_flatten(s["feats"])

    def stage(boxes, *rest):
        feats = jax.tree_util.tree_unflatten(tree, list(rest))
        return G.recognize_single_image(G.Ctx(train=False), arch, s["params"],
                                        feats, s["norm"], boxes)

    return _stage_loop(stage, 0, (s["boxes"], *flat))


def build_stage_crops():
    s = _model_state()
    arch = s["arch"]
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated

    return _stage_loop(
        lambda b: roi_align_rotated(
            s["norm"], b, arch.img_crop_hw, spatial_scale=1.0,
            sampling_ratio=arch.img_crop_sampling_ratio,
            max_sampling_ratio=arch.crop_max_sampling_ratio,
        ),
        0, (s["boxes"],),
    )


def build_stage_global_pool():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    from glass_tpu.ops.roi_align_rotated import roi_align_rotated

    ctx = G.Ctx(train=False)
    fused = G.p2p3_fusion_apply(
        ctx, s["params"]["roi_heads"]["recognizer_feature_fusion"],
        s["feats"]["p2"], s["feats"]["p3"],
    )[0]
    return _stage_loop(
        lambda b: roi_align_rotated(fused, b, arch.recognizer_pool_hw,
                                    spatial_scale=0.25, sampling_ratio=0),
        0, (s["boxes"],),
    )


def build_stage_local_cnn():
    s = _model_state()
    G = s["G"]
    crops = jnp.asarray(
        rng.rand(s["arch"].detections_per_image, *s["arch"].img_crop_hw, 3)
        .astype(np.float32)
    ).astype(jnp.bfloat16 if s["arch"].compute_dtype == "bfloat16" else jnp.float32)
    return _stage_loop(
        lambda c: G.local_extractor_apply(
            G.Ctx(train=False), s["params"]["roi_heads"]["hybrid_net"]["ConvNet"], c
        ),
        0, (crops,),
    )


def build_stage_decode():
    s = _model_state()
    arch = s["arch"]
    from glass_tpu.models.recognizer import aster_decode_greedy

    enc = jnp.asarray(rng.randn(arch.detections_per_image, 32, 256).astype(np.float32))
    return _stage_loop(
        lambda e: aster_decode_greedy(
            s["params"]["roi_heads"]["recognizer_head"]["decoder"], e,
            arch.max_word_len + 1,
        ),
        0, (enc,),
    )


def build_stage_mask():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    flat, tree = jax.tree_util.tree_flatten(s["feats"])

    def stage(boxes, *rest):
        feats = jax.tree_util.tree_unflatten(tree, list(rest))
        return G.mask_single_image(
            G.Ctx(train=False), arch, s["params"], feats, boxes,
            jnp.zeros((boxes.shape[0],), jnp.int32),
        )

    return _stage_loop(stage, 0, (s["boxes"], *flat))


def build_stage_full():
    s = _model_state()
    G, arch = s["G"], s["arch"]
    return _stage_loop(
        lambda img: G.glass_inference_single(arch, s["params"], img, s["content_hw"]),
        0, (s["image"],),
    )


BUILDERS = {
    "topk_p2": build_topk_p2,
    "topk_all5": build_topk_all5,
    "approx_topk_p2": build_approx_topk_p2,
    "iou1000": build_iou1000,
    "nms1000": build_nms1000,
    "nms512": build_nms512,
    "nms256": build_nms256,
    "select_proposals": build_select_proposals,
    "stage_backbone": build_stage_backbone,
    "stage_detect": build_stage_detect,
    "stage_recognize": build_stage_recognize,
    "stage_crops": build_stage_crops,
    "stage_global_pool": build_stage_global_pool,
    "stage_local_cnn": build_stage_local_cnn,
    "stage_decode": build_stage_decode,
    "stage_mask": build_stage_mask,
    "stage_full": build_stage_full,
}


def main():
    names = sys.argv[1:] or list(BUILDERS)
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        try:
            timed(name, BUILDERS[name])
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
