"""Rotated Mask R-CNN conv-upsample head.

Covers reference ``glass/modeling/roi_heads/rotated_mask_head.py:410-442``
(a standard ``MaskRCNNConvUpsampleHead`` body: NUM_CONV=4 3x3 convs + 2x2
stride-2 deconv + ReLU + 1x1 predictor, ``configs/glass_finetune_*.yaml``),
operating on ROIAlignRotated 14x14 crops.  The rotated-specific parts of the
reference (polygon rasterization targets, rotated paste) live in
train/targets.py and postprocess/paste.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, apply_bn


def mask_head_apply(ctx: Ctx, params: dict, x: jnp.ndarray,
                    num_conv: int = 4,
                    path: str = "roi_heads.mask_head") -> jnp.ndarray:
    """x: (N, 14, 14, C) -> mask logits (N, 28, 28, K)."""
    for i in range(num_conv):
        p = params[f"mask_fcn{i + 1}"]
        x = L.conv2d(x, p["weight"], p.get("bias"), padding=1)
        if "norm" in p:
            x = apply_bn(ctx, x, p["norm"], f"{path}.mask_fcn{i + 1}.norm")
        x = jnp.maximum(x, 0)
    x = L.conv_transpose2d(x, params["deconv"]["weight"], params["deconv"]["bias"], stride=2)
    x = jnp.maximum(x, 0)
    return L.conv2d(x, params["predictor"]["weight"], params["predictor"]["bias"])


def mask_inference_probs(logits: jnp.ndarray, classes: jnp.ndarray) -> jnp.ndarray:
    """detectron2 ``mask_rcnn_inference``: per-instance class channel, sigmoid.

    logits: (N, H, W, K); classes: (N,) -> (N, H, W) probabilities.
    """
    sel = jnp.take_along_axis(
        logits, classes[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel)


def init_mask_head(key, in_channels: int = 256, conv_dim: int = 256,
                   num_conv: int = 4, num_classes: int = 1, norm: str = "") -> dict:
    ks = jax.random.split(key, num_conv + 2)
    params = {}
    cin = in_channels
    for i in range(num_conv):
        p = {"weight": L.c2_msra_fill(ks[i], (3, 3, cin, conv_dim))}
        if norm:
            p["norm"] = L.init_bn(conv_dim)
        else:
            p["bias"] = jnp.zeros((conv_dim,), jnp.float32)
        params[f"mask_fcn{i + 1}"] = p
        cin = conv_dim
    params["deconv"] = {
        "weight": L.c2_msra_fill(ks[num_conv], (2, 2, conv_dim, conv_dim)),
        "bias": jnp.zeros((conv_dim,), jnp.float32),
    }
    params["predictor"] = {
        "weight": L.normal_init(ks[num_conv + 1], (1, 1, conv_dim, num_classes), 0.001),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }
    return params
