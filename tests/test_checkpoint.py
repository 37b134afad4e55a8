"""Checkpoint converter: synthetic d2-style state dict -> our param tree.

Without network access the released ``.pth`` files are unavailable, so the
converter is validated structurally: a state dict with the exact module
naming d2 emits for this model family must convert into a tree whose
every leaf matches the randomly-initialized parameter tree in path, shape
and dtype — which is what guarantees real checkpoints drop in.
"""

import numpy as np
import jax
import pytest

from glass_tpu.models import GlassArch, init_glass_params
from glass_tpu.train.checkpoint import convert_torch_state_dict, _walk_rename


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _torchify_name_and_value(path, value):
    """Map our tree path/value back to the d2 torch state_dict convention."""
    v = np.asarray(value)

    # recognizer head structural renames (reverse of _walk_rename)
    if "recognizer_head.encoder." in path:
        path = path.replace("recognizer_head.encoder.", "recognizer_head.encoder.bilsm_stack.")
    if "recognizer_head.decoder." in path:
        path = path.replace(
            "recognizer_head.decoder.", "recognizer_head.decoder.recognizer.decoder."
        )

    parts = path.split(".")
    leaf = parts[-1]

    # LSTM directions -> torch suffixes
    if len(parts) >= 2 and parts[-2] in ("fwd", "bwd"):
        suffix = "_reverse" if parts[-2] == "bwd" else ""
        name = ".".join(parts[:-2]) + f".{leaf}_l0{suffix}"
        return name, v
    if "gru" in parts and leaf in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        return path + "_l0", v

    if leaf == "weight" and v.ndim == 4:
        v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW (same inverse for deconv)
    if leaf == "weight" and v.ndim == 2 and "channel_add_conv" in path:
        v = v[:, :, None, None]  # linear (O,I) -> torch 1x1 conv OIHW
    return path, v


@pytest.mark.slow
def test_converter_roundtrip_structure():
    arch = GlassArch(mask_inference=True)
    params = init_glass_params(jax.random.PRNGKey(1), arch)
    flat = _flatten(params)

    # Build the synthetic torch state dict from the reference naming.
    state = {}
    for path, v in flat.items():
        name, tv = _torchify_name_and_value(path, v)
        state[name] = tv
    # Extra torch-side junk the converter must ignore.
    state["roi_heads.fusion_net.order"] = np.arange(512)
    state["roi_heads.recognizer_head.decoder.recognizer.decoder.temperature"] = np.ones(1)
    state["backbone.bottom_up.stem.conv1.norm.num_batches_tracked"] = np.array(7)

    # But LSTM bwd/fwd mapping above emitted e.g. `...rnn.weight_ih_l0`; the
    # forward direction must not collide with reverse: ensure both present.
    tree = _walk_rename(convert_torch_state_dict(state))
    got = _flatten(tree)

    missing = sorted(set(flat) - set(got))
    extra = sorted(set(got) - set(flat))
    assert not missing, f"converter missing {len(missing)} leaves, e.g. {missing[:5]}"
    assert not extra, f"converter produced {len(extra)} unknown leaves, e.g. {extra[:5]}"
    for k in flat:
        assert got[k].shape == flat[k].shape, (k, got[k].shape, flat[k].shape)
        np.testing.assert_allclose(got[k], flat[k], atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_converter_legacy_v2_mask_head_naming():
    """Legacy RecognizerROIHeadsV2 checkpoints name the recognizer as the
    'mask head' (reference recognizers_roi_heads_v2.py:55-96: the
    ROI_MASK_HEAD registry builds RecognizerRCNNHeadV2, so parameters are
    roi_heads.mask_head.{backbone,encoder,decoder}). The converter must
    remap them onto recognizer_head."""
    arch = GlassArch(mask_on=False)
    params = init_glass_params(jax.random.PRNGKey(2), arch)
    flat = _flatten(params)

    state = {}
    for path, v in flat.items():
        name, tv = _torchify_name_and_value(path, v)
        name = name.replace("roi_heads.recognizer_head.", "roi_heads.mask_head.")
        state[name] = tv

    tree = _walk_rename(convert_torch_state_dict(state))
    got = _flatten(tree)

    missing = sorted(set(flat) - set(got))
    extra = sorted(set(got) - set(flat))
    assert not missing, f"legacy remap missing {len(missing)}, e.g. {missing[:5]}"
    assert not extra, f"legacy remap extra {len(extra)}, e.g. {extra[:5]}"
    for k in flat:
        np.testing.assert_allclose(got[k], flat[k], atol=1e-6, err_msg=k)


def test_real_conv_mask_head_not_remapped():
    """A real MaskRCNN conv mask head (mask_fcn*/deconv/predictor) must NOT
    be mistaken for a legacy recognizer layout."""
    state = {
        "roi_heads.mask_head.mask_fcn1.weight": np.zeros((8, 4, 3, 3), np.float32),
        "roi_heads.mask_head.mask_fcn1.bias": np.zeros((8,), np.float32),
        "roi_heads.mask_head.deconv.weight": np.zeros((8, 8, 2, 2), np.float32),
        "roi_heads.mask_head.predictor.weight": np.zeros((1, 8, 1, 1), np.float32),
        "roi_heads.mask_head.predictor.bias": np.zeros((1,), np.float32),
    }
    tree = _walk_rename(convert_torch_state_dict(state))
    assert "mask_head" in tree["roi_heads"]
    assert "recognizer_head" not in tree["roi_heads"]
