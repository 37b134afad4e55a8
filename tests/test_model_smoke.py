"""End-to-end smoke tests of the jitted inference graph (tiny shapes)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.models import GlassArch, init_glass_params, glass_inference_single


@pytest.fixture(scope="module")
def tiny_arch():
    return GlassArch(
        rpn_pre_nms_topk=64,
        rpn_post_nms_topk=16,
        detections_per_image=8,
        max_word_len=5,
        mask_inference=True,
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_arch):
    return init_glass_params(jax.random.PRNGKey(0), tiny_arch)


def test_inference_shapes(tiny_arch, tiny_params):
    img = jnp.asarray(np.random.RandomState(0).rand(128, 160, 3) * 255, jnp.float32)
    out = glass_inference_single(
        tiny_arch, tiny_params, img, jnp.array([120, 150], jnp.int32)
    )
    assert out["boxes"].shape == (8, 5)
    assert out["scores"].shape == (8,)
    assert out["valid"].shape == (8,)
    # default TEXT_EMIT="topk": on-device argmax ids + per-step max probs
    assert out["text_ids"].shape == (8, 6)
    assert out["text_step_scores"].shape == (8, 6)
    assert out["mask_probs"].shape == (8, 28, 28)
    for v in out.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()

    # "probs" mode must agree with the on-device argmax exactly.
    import dataclasses

    probs_arch = dataclasses.replace(tiny_arch, text_emit="probs")
    out_p = glass_inference_single(
        probs_arch, tiny_params, img, jnp.array([120, 150], jnp.int32)
    )
    assert out_p["text_probs"].shape == (8, 6, 97)
    np.testing.assert_array_equal(
        np.asarray(out_p["text_probs"]).argmax(-1), np.asarray(out["text_ids"])
    )
    np.testing.assert_allclose(
        np.asarray(out_p["text_probs"]).max(-1),
        np.asarray(out["text_step_scores"]),
        rtol=1e-6,
    )


def test_inference_jits(tiny_arch, tiny_params):
    fn = jax.jit(lambda p, i, hw: glass_inference_single(tiny_arch, p, i, hw))
    img = jnp.zeros((128, 160, 3), jnp.float32)
    out = fn(tiny_params, img, jnp.array([128, 160], jnp.int32))
    assert out["boxes"].shape == (8, 5)


def test_from_config_rejects_decoder_codec_mismatch():
    """DECODER.NAME=CTC iff LABELS_TYPE=ctc (ADVICE r2: a mismatch shifts
    the vocabulary layout and silently corrupts targets + decoding)."""
    from glass_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.RECOGNIZER_ON = True
    cfg.MODEL.ROI_RECOGNIZER_HEAD.NAME = "RecognizerRCNNHeadV3"
    cfg.MODEL.ROI_RECOGNIZER_HEAD.RECOGNIZER_HEAD.DECODER.NAME = "CTC"
    cfg.MODEL.ROI_RECOGNIZER_HEAD.LABELS_TYPE = "attention"
    with pytest.raises(ValueError, match="LABELS_TYPE"):
        GlassArch.from_config(cfg)

    cfg.MODEL.ROI_RECOGNIZER_HEAD.LABELS_TYPE = "ctc"
    arch = GlassArch.from_config(cfg)  # consistent pair accepted
    assert arch.recognizer_decoder == "CTC"

    cfg.MODEL.ROI_RECOGNIZER_HEAD.RECOGNIZER_HEAD.DECODER.NAME = "ASTER_V2"
    with pytest.raises(ValueError, match="LABELS_TYPE"):
        GlassArch.from_config(cfg)


def test_from_config_rejects_v2_extractor_shape_mismatch():
    """ResNetFeatureExtractorV2 with the default 8x32 pool must be rejected
    with a clear message instead of a trace-time shape error (ADVICE r2)."""
    from glass_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.RECOGNIZER_ON = True
    cfg.MODEL.LOCAL_FEATURE_EXTRACTOR.NAME = "ResNetFeatureExtractorV2"
    with pytest.raises(ValueError, match="crop/4"):
        GlassArch.from_config(cfg)


def test_inference_uint8_matches_float(tiny_arch, tiny_params):
    """A uint8 input image (the eval upload dtype) routes the recognizer
    crops through the u8-packed gather with the normalization folded in;
    outputs must match the float-image path (f32 compute isolates crop
    numerics from bf16 rounding)."""
    import dataclasses

    arch = dataclasses.replace(tiny_arch, compute_dtype="float32")
    img_u8 = (np.random.RandomState(1).rand(128, 160, 3) * 255).astype(np.uint8)
    hw = jnp.array([120, 150], jnp.int32)
    out_u8 = glass_inference_single(arch, tiny_params, jnp.asarray(img_u8), hw)
    out_f = glass_inference_single(
        arch, tiny_params, jnp.asarray(img_u8.astype(np.float32)), hw
    )
    np.testing.assert_allclose(
        np.asarray(out_u8["boxes"]), np.asarray(out_f["boxes"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_u8["scores"]), np.asarray(out_f["scores"]), atol=1e-4
    )
    assert out_u8["text_ids"].shape == out_f["text_ids"].shape
    np.testing.assert_allclose(
        np.asarray(out_u8["text_step_scores"], np.float32),
        np.asarray(out_f["text_step_scores"], np.float32),
        atol=2e-3,
    )
