"""Local feature extractor: the "Res34-like" CNN over raw-image word crops.

Re-implements reference ``glass/modeling/fusion/local_feature_extraction.py``
(``ResNetFeatureExtractor`` -> ``ResNet(input=3, out=256, BasicBlock,
layers=[1,2,5,3])``): three maxpools (the last with stride (2,1) and width
padding) plus a final 2x2 stride-(2,1) conv, taking the 128x128 rotated crop
to an (8, 32, 256) tensor shape-matched to the pooled global features.

Parameter tree mirrors the torch module names under ``ConvNet.*`` so released
checkpoints convert mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, apply_bn

LAYERS = [1, 2, 5, 3]
# output_channel = 256: block channels [64, 128, 256, 256], stem 16 -> 32.
OUT = 256
BLOCK_CH = [OUT // 4, OUT // 2, OUT, OUT]


def _basic_block(ctx: Ctx, x, p, path):
    out = L.conv2d(x, p["conv1"]["weight"], padding=1)
    out = apply_bn(ctx, out, p["bn1"], f"{path}.bn1")
    out = jnp.maximum(out, 0)
    out = L.conv2d(out, p["conv2"]["weight"], padding=1)
    out = apply_bn(ctx, out, p["bn2"], f"{path}.bn2")
    if "downsample" in p:
        residual = L.conv2d(x, p["downsample"]["0"]["weight"])
        residual = apply_bn(ctx, residual, p["downsample"]["1"], f"{path}.downsample.1")
    else:
        residual = x
    return jnp.maximum(out + residual, 0)


def _stage(ctx: Ctx, x, p, path, n_blocks):
    for i in range(n_blocks):
        x = _basic_block(ctx, x, p[str(i)], f"{path}.{i}")
    return x


def local_extractor_apply(ctx: Ctx, params: dict, crops: jnp.ndarray,
                          path: str = "roi_heads.hybrid_net.ConvNet") -> jnp.ndarray:
    """crops: (N, 128, 128, 3) normalized image crops -> (N, 8, 32, 256)."""
    p = params
    x = L.conv2d(crops, p["conv0_1"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn0_1"], f"{path}.bn0_1"), 0)
    x = L.conv2d(x, p["conv0_2"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn0_2"], f"{path}.bn0_2"), 0)

    x = L.max_pool2d(x, 2, 2, 0)
    x = _stage(ctx, x, p["layer1"], f"{path}.layer1", LAYERS[0])
    x = L.conv2d(x, p["conv1"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn1"], f"{path}.bn1"), 0)

    x = L.max_pool2d(x, 2, 2, 0)
    x = _stage(ctx, x, p["layer2"], f"{path}.layer2", LAYERS[1])
    x = L.conv2d(x, p["conv2"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn2"], f"{path}.bn2"), 0)

    x = L.max_pool2d(x, 2, (2, 1), (0, 1))
    x = _stage(ctx, x, p["layer3"], f"{path}.layer3", LAYERS[2])
    x = L.conv2d(x, p["conv3"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn3"], f"{path}.bn3"), 0)

    x = _stage(ctx, x, p["layer4"], f"{path}.layer4", LAYERS[3])
    x = L.conv2d(x, p["conv4_1"]["weight"], stride=(2, 1), padding=0)
    x = jnp.maximum(apply_bn(ctx, x, p["bn4_1"], f"{path}.bn4_1"), 0)
    return x


def local_extractor_v2_apply(ctx: Ctx, params: dict, crops: jnp.ndarray,
                             path: str = "roi_heads.hybrid_net.ConvNet") -> jnp.ndarray:
    """``ResNetFeatureExtractorV2`` (reference ``local_feature_extraction.py:191-288``):
    same block stack but only the first two 2x2 maxpools and no final
    stride, so a (N, 128, 128, 3) crop maps to (N, 32, 32, 256)."""
    p = params
    x = L.conv2d(crops, p["conv0_1"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn0_1"], f"{path}.bn0_1"), 0)
    x = L.conv2d(x, p["conv0_2"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn0_2"], f"{path}.bn0_2"), 0)

    x = L.max_pool2d(x, 2, 2, 0)
    x = _stage(ctx, x, p["layer1"], f"{path}.layer1", LAYERS[0])
    x = L.conv2d(x, p["conv1"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn1"], f"{path}.bn1"), 0)

    x = L.max_pool2d(x, 2, 2, 0)
    x = _stage(ctx, x, p["layer2"], f"{path}.layer2", LAYERS[1])
    x = L.conv2d(x, p["conv2"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn2"], f"{path}.bn2"), 0)

    x = _stage(ctx, x, p["layer3"], f"{path}.layer3", LAYERS[2])
    x = L.conv2d(x, p["conv3"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn3"], f"{path}.bn3"), 0)

    x = _stage(ctx, x, p["layer4"], f"{path}.layer4", LAYERS[3])
    x = L.conv2d(x, p["conv4_1"]["weight"], padding=1)
    x = jnp.maximum(apply_bn(ctx, x, p["bn4_1"], f"{path}.bn4_1"), 0)
    return x


# Registry keyed on MODEL.LOCAL_FEATURE_EXTRACTOR.NAME (the reference's
# LOCAL_FEATURE_EXTRACTOR_REGISTRY, local_feature_extraction.py:9-19).  The
# reference's own config default "ResNet_FeatureExtractor" is an unregistered
# name there (would KeyError); released configs all say ResNetFeatureExtractor.
# GRCL / ResNet_ASTER / FeatureAttention (local_extractor_variants.py) are
# unregistered internals in the reference too — library-only, not selectable.
LOCAL_EXTRACTOR_REGISTRY = {
    "ResNetFeatureExtractor": None,  # filled in below (functions defined above)
    "ResNetFeatureExtractorV2": None,
}


def local_extractor_forward(ctx: Ctx, params: dict, crops: jnp.ndarray,
                            name: str = "ResNetFeatureExtractor",
                            path: str = "roi_heads.hybrid_net.ConvNet") -> jnp.ndarray:
    """Dispatch on the configured extractor name."""
    try:
        apply_fn, _ = LOCAL_EXTRACTOR_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown MODEL.LOCAL_FEATURE_EXTRACTOR.NAME {name!r}; supported: "
            f"{sorted(LOCAL_EXTRACTOR_REGISTRY)} (GRCL/ResNet_ASTER/"
            "FeatureAttention are library-only building blocks, unregistered "
            "in the reference as well)"
        ) from None
    return apply_fn(ctx, params, crops, path=path)


def init_local_extractor_by_name(key, name: str = "ResNetFeatureExtractor") -> dict:
    try:
        _, init_fn = LOCAL_EXTRACTOR_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown MODEL.LOCAL_FEATURE_EXTRACTOR.NAME {name!r}; supported: "
            f"{sorted(LOCAL_EXTRACTOR_REGISTRY)}"
        ) from None
    return init_fn(key)


def init_local_extractor(key) -> dict:
    keys = iter(jax.random.split(key, 80))

    def conv(kh, kw, cin, cout):
        return {"weight": L.c2_msra_fill(next(keys), (kh, kw, cin, cout))}

    def block(cin, cout, downsample):
        b = {
            "conv1": conv(3, 3, cin, cout),
            "bn1": L.init_bn(cout),
            "conv2": conv(3, 3, cout, cout),
            "bn2": L.init_bn(cout),
        }
        if downsample:
            b["downsample"] = {"0": conv(1, 1, cin, cout), "1": L.init_bn(cout)}
        return b

    def stage(cin, cout, n):
        s = {"0": block(cin, cout, cin != cout)}
        for i in range(1, n):
            s[str(i)] = block(cout, cout, False)
        return s

    inplanes = OUT // 8
    params = {
        "conv0_1": conv(3, 3, 3, OUT // 16),
        "bn0_1": L.init_bn(OUT // 16),
        "conv0_2": conv(3, 3, OUT // 16, inplanes),
        "bn0_2": L.init_bn(inplanes),
        "layer1": stage(inplanes, BLOCK_CH[0], LAYERS[0]),
        "conv1": conv(3, 3, BLOCK_CH[0], BLOCK_CH[0]),
        "bn1": L.init_bn(BLOCK_CH[0]),
        "layer2": stage(BLOCK_CH[0], BLOCK_CH[1], LAYERS[1]),
        "conv2": conv(3, 3, BLOCK_CH[1], BLOCK_CH[1]),
        "bn2": L.init_bn(BLOCK_CH[1]),
        "layer3": stage(BLOCK_CH[1], BLOCK_CH[2], LAYERS[2]),
        "conv3": conv(3, 3, BLOCK_CH[2], BLOCK_CH[2]),
        "bn3": L.init_bn(BLOCK_CH[2]),
        "layer4": stage(BLOCK_CH[2], BLOCK_CH[3], LAYERS[3]),
        "conv4_1": conv(2, 2, BLOCK_CH[3], BLOCK_CH[3]),
        "bn4_1": L.init_bn(BLOCK_CH[3]),
    }
    return params


def init_local_extractor_v2(key) -> dict:
    """Same tree as V1 except conv4_1 is 3x3 (reference :227-228)."""
    params = init_local_extractor(key)
    w = params["conv4_1"]["weight"]
    params["conv4_1"] = {
        "weight": L.c2_msra_fill(
            jax.random.fold_in(key, 41), (3, 3, w.shape[2], w.shape[3])
        )
    }
    return params


LOCAL_EXTRACTOR_REGISTRY["ResNetFeatureExtractor"] = (
    local_extractor_apply, init_local_extractor,
)
LOCAL_EXTRACTOR_REGISTRY["ResNetFeatureExtractorV2"] = (
    local_extractor_v2_apply, init_local_extractor_v2,
)
