"""Checkpointing: Orbax-native save/load plus a torch ``.pth`` converter.

The reference family distributes trained weights as detectron2
``DetectionCheckpointer`` torch pickles (reference ``README.md:72-74``,
``glass_runner.py:59-60``).  ``convert_torch_state_dict`` maps those flat
``module.sub.weight`` names onto this framework's nested-pytree layout:

* conv weights   OIHW -> HWIO,
* deconv weights (in,out,kh,kw) -> HWIO (gradient layout, see layers.py),
* linear weights keep the torch (out, in) layout,
* LSTM/GRU weights keep the torch gate-packed layout,
* BN running stats map verbatim.

Because the param tree deliberately mirrors the torch module paths, the
mapping is mechanical: only a few structural renames are needed.
"""

from __future__ import annotations

import os
import pickle
import re
import shutil
from typing import Dict

import logging

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _set_path(tree: dict, path: list, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(state: Dict[str, "np.ndarray"]) -> dict:
    """Flat torch state-dict (numpy values) -> nested jax pytree."""
    tree: dict = {}
    for name, value in state.items():
        v = np.asarray(value)
        parts = name.split(".")
        leaf = parts[-1]
        module = parts[-2] if len(parts) >= 2 else ""

        if leaf == "num_batches_tracked" or module == "temperature" or leaf == "temperature":
            continue
        if leaf == "order":  # GCAttention channel-interleave buffer (constant)
            continue
        # Non-parameter buffers some d2 exports persist: the GeneralizedRCNN
        # normalization constants and the anchor-generator cell anchors
        # (both re-derived from the config here).
        if name in ("pixel_mean", "pixel_std") or "cell_anchors" in parts:
            continue

        # Conv OIHW -> HWIO; torch deconv (in,out,kh,kw) -> HW(I=out)(O=in):
        # the same transpose serves both (see layers.conv_transpose2d).
        if leaf == "weight" and v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)

        # GC attention bottleneck 1x1 convs: store as linear (out, in).
        # (channel_add/mul/concat variants all use the same Sequential shape,
        # reference fusion_modules.py:60-79; cat_conv stays a real conv.)
        if (len(parts) >= 3 and leaf == "weight" and v.ndim == 4 and
                parts[-3] in ("channel_add_conv", "channel_mul_conv", "channel_concat_conv")):
            # was transposed above to HWIO (1,1,I,O); bring back to (O, I)
            v = v[0, 0].T

        # LSTM direction split: weight_ih_l0 / weight_ih_l0_reverse -> fwd/bwd.
        m = re.match(r"(weight|bias)_(ih|hh)_l0(_reverse)?$", leaf)
        if m and "rnn" in parts:
            direction = "bwd" if m.group(3) else "fwd"
            path = parts[:-1] + [direction, f"{m.group(1)}_{m.group(2)}"]
            _set_path(tree, path, jnp.asarray(v))
            continue
        # GRU inside the ASTER decoder (single direction).
        if m and "gru" in parts:
            path = parts[:-1] + [f"{m.group(1)}_{m.group(2)}"]
            _set_path(tree, path, jnp.asarray(v))
            continue

        _set_path(tree, parts, jnp.asarray(v))
    return tree


def _walk_rename(tree):
    """Post-structural fixups mapping d2 module names to our layout."""
    # d2 names recognizer decoder as `decoder.recognizer.decoder.*`
    # (ASTER_V2 -> AttentionRecognitionHead -> DecoderUnit); flatten it.
    def fix_recognizer_head(rh):
        dec = rh.get("decoder")
        if isinstance(dec, dict) and "recognizer" in dec:
            inner = dec["recognizer"]["decoder"]
            rh["decoder"] = inner
        enc = rh.get("encoder")
        if isinstance(enc, dict) and "bilsm_stack" in enc:
            rh["encoder"] = enc["bilsm_stack"]
        return rh

    roi = tree.get("roi_heads", {})
    if "recognizer_head" in roi:
        roi["recognizer_head"] = fix_recognizer_head(roi["recognizer_head"])

    # Legacy RecognizerROIHeadsV2 checkpoints (reference
    # recognizers_roi_heads_v2.py:55-96, recognizer_head_v2.py:176-205)
    # register the recognizer AS the "mask head": parameters live at
    # roi_heads.mask_head.{backbone,encoder,decoder}. Remap onto
    # recognizer_head (that layout has no conv mask head; a real
    # MaskRCNN head — mask_fcn*/deconv/predictor — has neither an
    # encoder nor a decoder child and is left untouched).
    mh = roi.get("mask_head")
    if (
        isinstance(mh, dict)
        and "recognizer_head" not in roi
        and "backbone" in mh
        and ("encoder" in mh or "decoder" in mh)
    ):
        roi["recognizer_head"] = fix_recognizer_head(roi.pop("mask_head"))
    return tree


_C2_STAGE_BLOCKS = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
_C2_BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
              "branch1": "shortcut"}


def convert_caffe2_resnet50(state: Dict[str, "np.ndarray"]) -> dict:
    """Caffe2 ImageNet R-50 pickle -> backbone.bottom_up parameter tree.

    The reference pretrain initializes from
    ``detectron2://ImageNetPretrained/MSRA/R-50.pkl``
    (``configs/glass_pretrain.yaml:39``), whose names are caffe2-style
    (``res2_0_branch2a_w`` / ``..._bn_s`` / ``..._bn_b``).  BN appears as
    affine scale/bias only (stats absorbed) — mapped onto identity running
    stats.
    """
    tree: dict = {}

    def put(path, w=None, bn_s=None, bn_b=None):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        leaf = node.setdefault(path[-1], {})
        if w is not None:
            leaf["weight"] = jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))
        if bn_s is not None:
            c = np.asarray(bn_s).shape[0]
            leaf["norm"] = {
                "weight": jnp.asarray(np.asarray(bn_s)),
                "bias": jnp.asarray(np.asarray(bn_b)),
                "running_mean": jnp.zeros((c,), jnp.float32),
                "running_var": jnp.ones((c,), jnp.float32),
            }

    put(["stem", "conv1"], w=state["conv1_w"],
        bn_s=state["res_conv1_bn_s"], bn_b=state["res_conv1_bn_b"])

    for stage, n_blocks in _C2_STAGE_BLOCKS.items():
        for i in range(n_blocks):
            for c2b, ours in _C2_BRANCH.items():
                key = f"{stage}_{i}_{c2b}"
                if f"{key}_w" not in state:
                    continue
                put(
                    [stage, str(i), ours],
                    w=state[f"{key}_w"],
                    bn_s=state[f"{key}_bn_s"],
                    bn_b=state[f"{key}_bn_b"],
                )
    return tree


def load_torch_checkpoint(path: str) -> dict:
    """Load a detectron2 ``.pth``/``.pkl`` checkpoint into a jax pytree."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        state = data.get("model", data)
        state = {k: np.asarray(v) for k, v in state.items() if isinstance(v, np.ndarray)}
        if "conv1_w" in state:  # caffe2 ImageNet trunk
            return {"backbone": {"bottom_up": convert_caffe2_resnet50(state)}}
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        state = data.get("model", data)
        state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}
    tree = convert_torch_state_dict(state)
    return _walk_rename(tree)


def load_any_checkpoint(path: str) -> dict:
    """Load params from a torch ``.pth``/``.pkl`` file or an Orbax directory
    (either a save root containing ``last_checkpoint`` or a ckpt dir)."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "last_checkpoint")):
            state = load_checkpoint(path)
        else:
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return state["params"] if "params" in state else state
    return load_torch_checkpoint(path)


def overlay_params(base: dict, loaded: dict, path: str = "") -> dict:
    """Overlay checkpoint leaves onto an initialized tree (partial load).

    detectron2's ``DetectionCheckpointer`` loads whatever names match and
    leaves the rest initialized (e.g. ImageNet trunk under a full model);
    same semantics here, with logging for loaded/missing subtrees.
    """
    out = dict(base)
    for k, v in loaded.items():
        full = f"{path}.{k}" if path else k
        if k not in base:
            logger.warning("checkpoint key not in model, skipped: %s", full)
            continue
        if isinstance(v, dict) and isinstance(base[k], dict):
            out[k] = overlay_params(base[k], v, full)
        else:
            if np.shape(base[k]) != np.shape(v):
                logger.warning(
                    "shape mismatch for %s: model %s vs checkpoint %s — skipped",
                    full, np.shape(base[k]), np.shape(v),
                )
                continue
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Orbax-native checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str, step: int, params: dict, opt_state=None, extra=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"ckpt_{step:07d}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra is not None:
        payload["extra"] = extra
    if os.path.exists(path):
        # Re-saving the same step must win (d2's PeriodicCheckpointer
        # overwrites): happens on final-iteration saves that coincide with
        # the periodic save, or when re-running into an output dir left by
        # an interrupted run without --resume.  Write the replacement to a
        # side path first so a crash mid-save never destroys the old
        # checkpoint, then swap atomically-enough (rename after success).
        tmp = path + ".replace"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ckptr.save(tmp, payload)
        ckptr.wait_until_finished()
        shutil.rmtree(path)
        os.rename(tmp, path)
    else:
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
    with open(os.path.join(directory, "last_checkpoint"), "w") as f:
        f.write(os.path.basename(path))
    return path


def load_checkpoint(directory: str, step: int | None = None):
    import orbax.checkpoint as ocp

    if step is None:
        with open(os.path.join(directory, "last_checkpoint")) as f:
            name = f.read().strip()
        path = os.path.join(directory, name)
    else:
        path = os.path.join(directory, f"ckpt_{step:07d}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
