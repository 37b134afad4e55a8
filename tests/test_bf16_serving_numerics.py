"""bf16 serving numerics vs f32 (VERDICT r2 #1b).

``TPU.COMPUTE_DTYPE`` defaults the serving path to bfloat16
(``models/glass_rcnn.py``); this test bounds the stage-level deltas of the
default path against float32 on the same weights:

* backbone+FPN features,
* box-head class logits and box deltas on FIXED proposals,
* recognizer character distributions on FIXED word boxes,
* mask probabilities on FIXED boxes.

Fixed boxes (rather than the model's own detections) isolate *numerics*
from *selection*: with random mirror weights the RPN scores are near-tied
noise, so top-k/NMS ordering flips under any rounding change and the final
detection sets are incomparable — an artifact of untrained weights, not of
the bf16 path (trained scores are well-separated).  The measured bounds are
recorded in BASELINE.md; a regression here means the bf16 path drifted.
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.models import GlassArch, init_glass_params
from glass_tpu.models.glass_rcnn import (
    backbone_features,
    box_head_predictions,
    mask_single_image,
    preprocess,
    recognize_single_image,
)
from glass_tpu.models.context import Ctx


@pytest.fixture(scope="module")
def setup():
    arch32 = GlassArch(
        mask_inference=True, compute_dtype="float32", text_emit="probs"
    )
    arch16 = dataclasses.replace(arch32, compute_dtype="bfloat16")
    params = init_glass_params(jax.random.PRNGKey(3), arch32)
    rng = np.random.RandomState(0)
    h, w = 256, 320
    # Text-like structure: dark bars on a bright background + noise, so the
    # conv stack sees real gradients rather than pure noise.
    img = np.full((h, w, 3), 200.0, np.float32)
    for _ in range(12):
        y, x = rng.randint(10, h - 30), rng.randint(10, w - 70)
        bw, bh = rng.randint(30, 60), rng.randint(8, 16)
        img[y : y + bh, x : x + bw] = rng.uniform(0, 60)
    img += rng.randn(h, w, 3).astype(np.float32) * 8
    boxes = jnp.asarray(
        np.array(
            [
                [60.0, 40.0, 52.0, 14.0, 3.0],
                [160.0, 90.0, 40.0, 12.0, -8.0],
                [240.0, 200.0, 64.0, 16.0, 15.0],
                [90.0, 180.0, 36.0, 10.0, 0.0],
            ],
            np.float32,
        )
    )
    return arch32, arch16, params, jnp.asarray(img), boxes


def _stages(arch, params, img, boxes):
    """Jitted stage outputs (everything cast to f32 numpy on the way out)."""

    def fn(p, im, bx):
        ctx = Ctx(train=False)
        norm = preprocess(arch, im)
        feats = backbone_features(ctx, arch, p, norm[None])
        logits, deltas, _orient = box_head_predictions(ctx, arch, p, feats, bx)
        probs = recognize_single_image(ctx, arch, p, feats, norm, bx)
        masks = mask_single_image(
            ctx, arch, p, feats, bx, jnp.zeros((bx.shape[0],), jnp.int32)
        )
        return (
            {k: v[0] for k, v in feats.items()},
            logits,
            deltas,
            probs,
            masks,
        )

    feats, logits, deltas, probs, masks = jax.jit(fn)(params, img, boxes)
    return (
        {k: np.asarray(v, np.float32) for k, v in feats.items()},
        np.asarray(logits, np.float32),
        np.asarray(deltas, np.float32),
        np.asarray(probs, np.float32),
        np.asarray(masks, np.float32),
    )


def test_bf16_vs_f32_stage_deltas(setup):
    arch32, arch16, params, img, boxes = setup
    f32 = _stages(arch32, params, img, boxes)
    b16 = _stages(arch16, params, img, boxes)

    # Backbone+FPN: relative error of the feature tensors.
    feat_rel = {}
    for k in f32[0]:
        a, b = f32[0][k], b16[0][k]
        feat_rel[k] = float(
            np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        )
    assert max(feat_rel.values()) <= 0.05, feat_rel

    # Box head on fixed proposals: relative to the tensor's own scale
    # (random-init logits run to O(100); trained logits are O(1-10) and the
    # relative bound is what transfers).  Measured: ~1.8%.
    dlogit = np.abs(f32[1] - b16[1]).max() / max(np.abs(f32[1]).max(), 1e-6)
    ddelta = np.abs(f32[2] - b16[2]).max() / max(np.abs(f32[2]).max(), 1e-6)
    assert dlogit <= 0.05, f"class-logit rel delta {dlogit:.4f}"
    assert ddelta <= 0.05, f"box-delta rel delta {ddelta:.4f}"

    # Recognizer char distributions on fixed boxes: max prob delta. This
    # is the quantity lexicon/weighted-ED consume.
    dprob = np.abs(f32[3] - b16[3]).max()
    assert dprob <= 0.15, f"char-prob delta {dprob:.4f}"

    # Mask probabilities on fixed boxes.
    dmask = np.abs(f32[4] - b16[4]).max()
    assert dmask <= 0.15, f"mask-prob delta {dmask:.4f}"

    print(
        f"bf16-vs-f32 stage deltas: feats {feat_rel}, "
        f"dlogit {dlogit:.4f}, ddelta {ddelta:.4f}, "
        f"dprob {dprob:.4f}, dmask {dmask:.4f}"
    )


def test_bf16_vs_f32_decoder_logits(setup):
    """Non-vacuous recognizer bound (VERDICT r3 weak #6): at random init the
    greedy char distributions saturate to one-hot, so a prob-delta bound is
    trivially ~0.  Bound the quantities that actually carry information:

    * PRE-softmax teacher-forced decoder logits (relative), and
    * greedy char probabilities with the output projection rescaled so the
      distributions are demonstrably non-degenerate (entropy asserted).
    """
    arch32, arch16, params, img, boxes = setup
    from glass_tpu.models.glass_rcnn import recognizer_encode
    from glass_tpu.models.recognizer import aster_decode_greedy, aster_decode_train

    def enc_of(arch):
        def fn(p, im, bx):
            ctx = Ctx(train=False)
            norm = preprocess(arch, im)
            feats = backbone_features(ctx, arch, p, norm[None])
            return recognizer_encode(ctx, arch, p, feats, norm, bx).astype(
                jnp.float32
            )

        return jax.jit(fn)(params, img, boxes)

    enc32, enc16 = enc_of(arch32), enc_of(arch16)

    dec = params["roi_heads"]["recognizer_head"]["decoder"]
    T = arch32.max_word_len + 1
    targets = jnp.asarray(
        np.random.RandomState(1).randint(2, 60, (boxes.shape[0], T + 1)),
        jnp.int32,
    )
    tf_logits = jax.jit(lambda e: aster_decode_train(dec, e, targets, T))
    logits32 = np.asarray(tf_logits(enc32), np.float32)
    logits16 = np.asarray(tf_logits(enc16), np.float32)

    scale = float(np.abs(logits32).max())
    assert scale > 0.5, "decoder logits degenerate; bound would be vacuous"
    rel = np.abs(logits32 - logits16).max() / scale
    # measured ~1e-2 at random init (decoder runs f32; the delta enters
    # through the bf16 encoder sequence) — recorded in BASELINE.md
    assert rel <= 0.05, f"teacher-forced logit rel delta {rel:.4f}"

    # De-saturated greedy: rescale fc so distributions carry entropy, then
    # the prob bound is meaningful (the lexicon/weighted-ED consumable).
    s = 2.0 / scale
    dec_soft = dict(dec)
    dec_soft["fc"] = {
        "weight": dec["fc"]["weight"] * s,
        "bias": dec["fc"]["bias"] * s,
    }
    greedy = jax.jit(lambda e: aster_decode_greedy(dec_soft, e, T))
    p32 = np.asarray(greedy(enc32), np.float32)
    p16 = np.asarray(greedy(enc16), np.float32)
    emitted = p32.sum(-1) > 0.5  # zero rows = post-break padding
    assert emitted.any()
    max_prob = p32[emitted].max(-1)
    assert max_prob.mean() < 0.95, "still saturated; entropy check failed"
    dprob = np.abs(p32 - p16).max()
    assert dprob <= 0.08, f"de-saturated char-prob delta {dprob:.4f}"
    print(
        f"decoder bf16-vs-f32: tf-logit rel {rel:.4f} (scale {scale:.1f}), "
        f"de-saturated dprob {dprob:.4f}, mean max-prob {max_prob.mean():.3f}"
    )
