"""ResNet-50 backbone (detectron2-compatible parameter layout).

Re-implements the inherited backbone the reference selects via
``MODEL.BACKBONE.NAME: build_resnet_fpn_backbone`` with
``MODEL.RESNETS.{DEPTH:50, RES2_OUT_CHANNELS:256, STEM_OUT_CHANNELS:64}``
(reference ``configs/glass_pretrain.yaml:41-54``).

Parameter tree mirrors detectron2 checkpoint names::

    stem.conv1.{weight, norm.{weight,bias,running_mean,running_var}}
    res2.{0..2}.{conv1,conv2,conv3,shortcut}.{weight, norm.*}
    ...

so released ``.pth`` weights map over 1:1 (see train/checkpoint.py).
Activations NHWC, compute dtype of the caller's input.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx, apply_bn, conv_norm

# (num_blocks, bottleneck_channels, out_channels, stride) per stage for R-50
RESNET50_STAGES = [
    ("res2", 3, 64, 256, 1),
    ("res3", 4, 128, 512, 2),
    ("res4", 6, 256, 1024, 2),
    ("res5", 3, 512, 2048, 2),
]

STAGE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
STAGE_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}


def bottleneck_block(
    ctx: Ctx,
    x: jnp.ndarray,
    params: dict,
    path: str,
    stride: int,
    stride_in_1x1: bool = True,
) -> jnp.ndarray:
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = conv_norm(ctx, x, params["conv1"], f"{path}.conv1", stride=s1, relu=True)
    out = conv_norm(ctx, out, params["conv2"], f"{path}.conv2", stride=s3, padding=1, relu=True)
    out = conv_norm(ctx, out, params["conv3"], f"{path}.conv3")
    if "shortcut" in params:
        shortcut = conv_norm(ctx, x, params["shortcut"], f"{path}.shortcut", stride=stride)
    else:
        shortcut = x
    return jnp.maximum(out + shortcut, 0)


def _stem_conv_s2d(ctx: Ctx, x: jnp.ndarray, params: dict, path: str):
    """The 7x7/2 stem conv as an exact space-to-depth reparametrization.

    ``y[p] = sum_k x[2p-3+k] w[k]`` is rewritten as a stride-1 conv over
    the 2x2-space-to-depth'd image with the kernel zero-padded 7->8 and
    scattered into the matching (4, 4, 4*Cin, Cout) layout.  Bit-identical
    math (verified to float ULPs), but the dW backward contraction becomes
    MXU-shaped: 12 input lanes at quarter the positions instead of 3 lanes
    at full resolution — measured 13.1 -> 4.9 ms fwd+dW on v5e at 1024^2.
    Used on the training path only (inference has no dW and the extra
    pad+transpose of the full image measured ~0.7 ms slower than the
    direct conv).
    """
    kh, kw, cin, cout = params["weight"].shape
    assert (kh, kw) == (7, 7), "s2d stem reparametrization assumes 7x7/2"
    n, h, w, _ = x.shape
    # original conv: pad 3, stride 2.  With the kernel front-padded to 8,
    # output p reads x[2p-4 .. 2p+3]: pad left 4; right 2 (+1 if odd so
    # the s2d factor divides).
    x = jnp.pad(x, ((0, 0), (4, 2 + (h % 2)), (4, 2 + (w % 2)), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]
    x = (
        x.reshape(n, hp // 2, 2, wp // 2, 2, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hp // 2, wp // 2, 4 * cin)
    )
    w8 = jnp.pad(params["weight"], ((1, 0), (1, 0), (0, 0), (0, 0)))
    w8 = (
        w8.reshape(4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * cin, cout)
    )
    out = L.conv2d(x, w8, params.get("bias"), stride=1, padding=0)
    if "norm" in params:
        out = apply_bn(ctx, out, params["norm"], path + ".norm")
    return jnp.maximum(out, 0)


def _s2d4_selection():
    """S[B, r, s, j] = 1 iff tap j of the 7-tap kernel lands at block B,
    sub-position r for output phase s: j == 4B + r - 1 - 2s."""
    import numpy as np

    B = np.arange(3)[:, None, None, None]
    r = np.arange(4)[None, :, None, None]
    s = np.arange(2)[None, None, :, None]
    j = np.arange(7)[None, None, None, :]
    return (j == 4 * B + r - 1 - 2 * s).astype(np.float32)


def _stem_conv_s2d4(ctx: Ctx, x: jnp.ndarray, params: dict, path: str):
    """The 7x7/2 stem conv over a 4x4 space-to-depth grid.

    ``y[2m+s] = sum_j x[4m+2s-3+j] w[j]`` reads blocks m-1..m+1 of the
    4-strided image for both output phases s in {0,1}, so the conv
    becomes kernel-3 stride-1 over 16*Cin block channels producing
    4*Cout phase channels, followed by depth-to-space(2).  Exact math
    (float-ULP vs the direct conv, tests/test_s2d_stem.py); the
    contraction per position is K=3*3*16*Cin=432 -> N=4*Cout=256 — four
    full MXU result tiles where the 2x2 variant leaves half of one
    (K=768 -> N=64).  Measured fwd+dW at 1024^2 on v5e: 6.5 ms vs the
    2x2 variant's 11.1 ms (records/stem_variants2_r5.log).  Requires
    H, W divisible by 4 (resnet50_apply falls back to the 2x2 variant
    otherwise — train buckets are multiples of 32).
    """
    kh, kw, cin, cout = params["weight"].shape
    assert (kh, kw) == (7, 7), "s2d4 stem reparametrization assumes 7x7/2"
    n, h, w, _ = x.shape
    wt = params["weight"]
    S = jnp.asarray(_s2d4_selection(), wt.dtype)  # (3,4,2,7)
    W4 = jnp.einsum("arsj,bqtk,jkio->abrqisto", S, S, wt)
    W4 = W4.reshape(3, 3, 16 * cin, 4 * cout)
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hb, wb = (h + 8) // 4, (w + 8) // 4
    X = (
        xp.reshape(n, hb, 4, wb, 4, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hb, wb, 16 * cin)
    )
    out = L.conv2d(X, W4, None, stride=1, padding=0)  # (n, h/4, w/4, 4*cout)
    m, nn = out.shape[1], out.shape[2]
    out = (
        out.reshape(n, m, nn, 2, 2, cout)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * m, 2 * nn, cout)
    )
    if params.get("bias") is not None:
        out = out + params["bias"].astype(out.dtype)
    if "norm" in params:
        out = apply_bn(ctx, out, params["norm"], path + ".norm")
    return jnp.maximum(out, 0)


def resnet50_apply(
    ctx: Ctx,
    params: dict,
    x: jnp.ndarray,
    out_features: List[str] = ("res2", "res3", "res4", "res5"),
    path: str = "backbone.bottom_up",
    freeze_at: int = 0,
    stem_backend: str = "s2d4",
) -> Dict[str, jnp.ndarray]:
    """x: (N, H, W, 3) normalized image -> dict of stage features.

    ``freeze_at`` follows d2 ``MODEL.BACKBONE.FREEZE_AT`` (resnet.py
    ``freeze()``): 1 freezes the stem, 2 also res2, ... 5 the whole
    backbone.  Frozen parts run FrozenBN semantics (running stats, no
    stat updates — an eval-mode Ctx) and their gradients are stopped, so
    XLA drops their dW/dx convolutions entirely.  The GLASS configs all
    set 0 (everything trains); the knob exists for config parity and for
    finetune users who want the (large) backbone-backward savings.
    """

    def stage_ctx(stage_index: int) -> Ctx:
        if ctx.train and freeze_at >= stage_index:
            return Ctx(train=False)
        return ctx

    if ctx.train and freeze_at < 1 and stem_backend != "plain":
        n, h, w, _ = x.shape
        if stem_backend == "s2d4" and h % 4 == 0 and w % 4 == 0:
            stem_fn = _stem_conv_s2d4
        else:
            stem_fn = _stem_conv_s2d
        out = stem_fn(
            stage_ctx(1), x, params["stem"]["conv1"], f"{path}.stem.conv1"
        )
    else:
        out = conv_norm(
            stage_ctx(1), x, params["stem"]["conv1"], f"{path}.stem.conv1",
            stride=2, padding=3, relu=True,
        )
    out = L.max_pool2d(out, 3, 2, 1)
    if ctx.train and freeze_at >= 1:
        out = jax.lax.stop_gradient(out)

    feats = {}
    for idx, (name, n_blocks, _, _, stride) in enumerate(RESNET50_STAGES, start=2):
        stage = params[name]
        sctx = stage_ctx(idx)
        for i in range(n_blocks):
            out = bottleneck_block(
                sctx, out, stage[str(i)], f"{path}.{name}.{i}", stride if i == 0 else 1
            )
        if ctx.train and freeze_at >= idx:
            out = jax.lax.stop_gradient(out)
        if name in out_features:
            feats[name] = out
    return feats


def init_resnet50(key, norm: str = "BN") -> dict:
    """Random init matching detectron2's scheme (MSRA fill on convs)."""
    keys = jax.random.split(key, 64)
    ki = iter(range(64))

    def conv(kh, kw, cin, cout):
        p = {"weight": L.c2_msra_fill(keys[next(ki)], (kh, kw, cin, cout))}
        if norm:
            p["norm"] = L.init_bn(cout)
        else:
            p["bias"] = jnp.zeros((cout,), jnp.float32)
        return p

    params = {"stem": {"conv1": conv(7, 7, 3, 64)}}
    in_ch = 64
    for name, n_blocks, bottleneck, out_ch, _ in RESNET50_STAGES:
        stage = {}
        for i in range(n_blocks):
            block = {
                "conv1": conv(1, 1, in_ch if i == 0 else out_ch, bottleneck),
                "conv2": conv(3, 3, bottleneck, bottleneck),
                "conv3": conv(1, 1, bottleneck, out_ch),
            }
            if i == 0:
                block["shortcut"] = conv(1, 1, in_ch, out_ch)
            stage[str(i)] = block
        params[name] = stage
        in_ch = out_ch
    return params
