"""Alternative local-feature-extractor bodies.

The reference ships three additional extractor families alongside the
default [1,2,5,3] ResNet (``glass/modeling/fusion/local_feature_extraction
.py``): the gated recurrent conv stack (GRCL, :44-92), the ASTER trunk
(AsterBlock/ResNet_ASTER, :360-448) and a sigmoid FeatureAttention gate
(:326-333).  None are selected by released configs; they are provided for
model-family completeness with the same pytree/param conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, apply_bn


# ---------------------------------------------------------------------------
# GRCL: gated recurrent convolution layer
# ---------------------------------------------------------------------------


def grcl_apply(ctx: Ctx, params: dict, x: jnp.ndarray, num_iteration: int,
               path: str = "grcl") -> jnp.ndarray:
    """GRCL forward (reference :59-70): the input projections are constant
    over recurrence steps; each step gates the recurrent state."""
    wgf_u = L.conv2d(x, params["wgf_u"]["weight"])
    wf_u = L.conv2d(x, params["wf_u"]["weight"], padding=params["wf_u"]["weight"].shape[0] // 2)
    state = jnp.maximum(apply_bn(ctx, wf_u, params["BN_x_init"], f"{path}.BN_x_init"), 0)

    for i in range(num_iteration):
        unit = params["GRCL"][str(i)]
        upath = f"{path}.GRCL.{i}"
        wgr_x = L.conv2d(state, params["wgr_x"]["weight"])
        wr_x = L.conv2d(state, params["wr_x"]["weight"],
                        padding=params["wr_x"]["weight"].shape[0] // 2)
        g = jax.nn.sigmoid(
            apply_bn(ctx, wgf_u, unit["BN_gfu"], f"{upath}.BN_gfu")
            + apply_bn(ctx, wgr_x, unit["BN_grx"], f"{upath}.BN_grx")
        )
        gated = apply_bn(
            ctx,
            apply_bn(ctx, wr_x, unit["BN_rx"], f"{upath}.BN_rx") * g,
            unit["BN_Gx"],
            f"{upath}.BN_Gx",
        )
        state = jnp.maximum(
            apply_bn(ctx, wf_u, unit["BN_fu"], f"{upath}.BN_fu") + gated, 0
        )
    return state


def init_grcl(key, cin: int, cout: int, num_iteration: int, kernel: int) -> dict:
    ks = iter(jax.random.split(key, 4 + 5 * num_iteration))
    params = {
        "wgf_u": {"weight": L.c2_msra_fill(next(ks), (1, 1, cin, cout))},
        "wgr_x": {"weight": L.c2_msra_fill(next(ks), (1, 1, cout, cout))},
        "wf_u": {"weight": L.c2_msra_fill(next(ks), (kernel, kernel, cin, cout))},
        "wr_x": {"weight": L.c2_msra_fill(next(ks), (kernel, kernel, cout, cout))},
        "BN_x_init": L.init_bn(cout),
        "GRCL": {
            str(i): {name: L.init_bn(cout)
                     for name in ("BN_gfu", "BN_grx", "BN_fu", "BN_rx", "BN_Gx")}
            for i in range(num_iteration)
        },
    }
    return params


# ---------------------------------------------------------------------------
# ResNet_ASTER trunk
# ---------------------------------------------------------------------------

ASTER_STAGES = [
    # (planes, blocks, stride_hw)
    (32, 3, (2, 2)),
    (64, 4, (2, 2)),
    (128, 6, (2, 1)),
    (256, 6, (2, 1)),
    (512, 3, (2, 1)),
]


def _aster_block(ctx: Ctx, p: dict, x, stride, path):
    out = L.conv2d(x, p["conv1"]["weight"], stride=stride)
    out = jnp.maximum(apply_bn(ctx, out, p["bn1"], f"{path}.bn1"), 0)
    out = L.conv2d(out, p["conv2"]["weight"], padding=1)
    out = apply_bn(ctx, out, p["bn2"], f"{path}.bn2")
    if "downsample" in p:
        residual = L.conv2d(x, p["downsample"]["0"]["weight"], stride=stride)
        residual = apply_bn(ctx, residual, p["downsample"]["1"], f"{path}.downsample.1")
    else:
        residual = x
    return jnp.maximum(out + residual, 0)


def resnet_aster_apply(ctx: Ctx, params: dict, x: jnp.ndarray,
                       path: str = "aster") -> jnp.ndarray:
    """(N, H, W, C_in) -> (N, W', C) sequence features (H collapsed to 1)."""
    out = L.conv2d(x, params["layer0"]["0"]["weight"], padding=1)
    out = jnp.maximum(apply_bn(ctx, out, params["layer0"]["1"], f"{path}.layer0.1"), 0)
    for si, (planes, blocks, stride) in enumerate(ASTER_STAGES, start=1):
        stage = params[f"layer{si}"]
        for bi in range(blocks):
            out = _aster_block(
                ctx, stage[str(bi)], out, stride if bi == 0 else 1,
                f"{path}.layer{si}.{bi}",
            )
    # (N, 1, W, C) -> (N, W, C)
    return out[:, 0]


def init_resnet_aster(key, in_channels: int = 3) -> dict:
    ks = iter(jax.random.split(key, 256))

    def conv(kh, kw, cin, cout):
        return {"weight": L.c2_msra_fill(next(ks), (kh, kw, cin, cout))}

    params = {"layer0": {"0": conv(3, 3, in_channels, 32), "1": L.init_bn(32)}}
    inplanes = 32
    for si, (planes, blocks, stride) in enumerate(ASTER_STAGES, start=1):
        stage = {}
        for bi in range(blocks):
            block = {
                "conv1": conv(1, 1, inplanes if bi == 0 else planes, planes),
                "bn1": L.init_bn(planes),
                "conv2": conv(3, 3, planes, planes),
                "bn2": L.init_bn(planes),
            }
            if bi == 0 and (stride != (1, 1) or inplanes != planes):
                block["downsample"] = {
                    "0": conv(1, 1, inplanes, planes),
                    "1": L.init_bn(planes),
                }
            stage[str(bi)] = block
        params[f"layer{si}"] = stage
        inplanes = planes
    return params


# ---------------------------------------------------------------------------
# FeatureAttention
# ---------------------------------------------------------------------------


def feature_attention_apply(ctx: Ctx, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid conv gate (reference :326-333)."""
    return jax.nn.sigmoid(
        L.conv2d(x, params["conv"]["weight"], params["conv"]["bias"], padding=1)
    )
