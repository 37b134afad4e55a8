"""Feature Pyramid Network over the ResNet trunk.

Reference selects detectron2's ``build_resnet_fpn_backbone`` with
``FPN.IN_FEATURES [res2..res5], OUT_CHANNELS 256, FUSE_TYPE sum`` and a
``LastLevelMaxPool`` P6 (``configs/glass_pretrain.yaml:51-54``).  Parameter
names mirror detectron2 (``fpn_lateral2..5``, ``fpn_output2..5``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, conv_norm
from .resnet import STAGE_CHANNELS

FPN_LEVEL_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def fpn_apply(
    ctx: Ctx,
    params: dict,
    bottom_up: Dict[str, jnp.ndarray],
    path: str = "backbone",
) -> Dict[str, jnp.ndarray]:
    """bottom_up: dict res2..res5 (NHWC) -> dict p2..p6."""
    stages = ["res2", "res3", "res4", "res5"]
    laterals = {}
    for i, s in enumerate(stages, start=2):
        laterals[s] = conv_norm(
            ctx, bottom_up[s], params[f"fpn_lateral{i}"], f"{path}.fpn_lateral{i}"
        )

    # Top-down pathway, sum fuse with nearest x2 upsampling.
    merged = {"res5": laterals["res5"]}
    for s_prev, s in (("res5", "res4"), ("res4", "res3"), ("res3", "res2")):
        merged[s] = laterals[s] + L.upsample_nearest_2x(merged[s_prev])

    out = {}
    for i, s in enumerate(stages, start=2):
        out[f"p{i}"] = conv_norm(
            ctx, merged[s], params[f"fpn_output{i}"], f"{path}.fpn_output{i}", padding=1
        )
    # LastLevelMaxPool: stride-2 1x1 max pool of p5.
    out["p6"] = L.max_pool2d(out["p5"], 1, 2, 0)
    return out


def init_fpn(key, out_channels: int = 256, norm: str = "BN") -> dict:
    keys = jax.random.split(key, 8)
    params = {}
    for idx, (i, s) in enumerate(zip(range(2, 6), ["res2", "res3", "res4", "res5"])):
        cin = STAGE_CHANNELS[s]
        lat = {"weight": L.caffe2_xavier(keys[2 * idx], (1, 1, cin, out_channels))}
        outp = {"weight": L.caffe2_xavier(keys[2 * idx + 1], (3, 3, out_channels, out_channels))}
        if norm:
            lat["norm"] = L.init_bn(out_channels)
            outp["norm"] = L.init_bn(out_channels)
        else:
            lat["bias"] = jnp.zeros((out_channels,), jnp.float32)
            outp["bias"] = jnp.zeros((out_channels,), jnp.float32)
        params[f"fpn_lateral{i}"] = lat
        params[f"fpn_output{i}"] = outp
    return params
