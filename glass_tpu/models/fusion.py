"""Global-to-local feature fusion: P2P3Fusion + MultiAspectGCAttention.

Re-implements reference ``glass/modeling/fusion/fusion_modules.py``:

* ``P2P3Fusion`` (:250-286): 1x1 conv each on p2 and upsampled p3, sum.
* ``MultiAspectGCAttention`` (:22-157): interleave local/global channels,
  8-header global-context attention (per-header 1x1 -> softmax over H*W ->
  channel context), ``channel_add`` bottleneck (1x1 -> LayerNorm -> ReLU ->
  1x1), then a 3x3 output conv 512 -> 256.

The attention pooling is expressed as batched matmuls over NHWC tensors
(one einsum per stage) so XLA maps it straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .context import Ctx


def p2p3_fusion_apply(ctx: Ctx, params: dict, p2: jnp.ndarray, p3: jnp.ndarray):
    """p2 (N,H,W,C), p3 (N,H/2,W/2,C) -> fused (N,H,W,C)."""
    x1 = L.conv2d(p2, params["conv1"]["weight"])
    x2 = L.conv2d(p3, params["conv2"]["weight"])
    x2 = L.upsample_nearest_2x(x2)
    # Guard odd input sizes: crop the upsampled map to p2's extent.
    x2 = x2[:, : x1.shape[1], : x1.shape[2], :]
    return x1 + x2


def gc_attention_apply(
    ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8
) -> jnp.ndarray:
    """MultiAspectGCAttention with fusion_type='channel_add'.

    x: (N, H, W, C) with C = local+global channels (local first, as
    concatenated by the hybrid head).  Returns (N, H, W, C_out).
    """
    n, h, w, c = x.shape
    half = c // 2
    # Channel interleave (reference `order`, fusion_modules.py:50-53):
    # even positions <- first half (local), odd <- second half (global).
    order = jnp.stack(
        [jnp.arange(half), jnp.arange(half) + half], axis=1
    ).reshape(-1)
    x = x[..., order]

    ch_per_head = c // headers
    xh = x.reshape(n, h * w, headers, ch_per_head)
    # conv_mask: per-header 1x1 conv (ch_per_head -> 1), shared across headers.
    w_mask = params["conv_mask"]["weight"].reshape(ch_per_head).astype(x.dtype)
    b_mask = params["conv_mask"]["bias"].astype(x.dtype)
    mask = jnp.einsum("nphc,c->nph", xh, w_mask) + b_mask  # (N, HW, heads)
    mask = jax.nn.softmax(mask, axis=1)
    context = jnp.einsum("nphc,nph->nhc", xh, mask).reshape(n, c)  # (N, C)

    # channel_add bottleneck: 1x1 conv -> LayerNorm -> ReLU -> 1x1 conv.
    cc = params["channel_add_conv"]
    t = L.linear(context, cc["0"]["weight"].reshape(-1, c), cc["0"]["bias"])
    t = L.layer_norm(t, cc["1"]["weight"].reshape(-1), cc["1"]["bias"].reshape(-1), axes=(-1,))
    t = jnp.maximum(t, 0)
    t = L.linear(t, cc["3"]["weight"].reshape(-1, t.shape[-1]), cc["3"]["bias"])
    out = x + t[:, None, None, :]

    return L.conv2d(out, params["out"]["weight"], params["out"]["bias"], padding=1)


def gc_attention_mul_apply(ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8):
    """fusion_type='channel_mul': sigmoid-gated channel scaling."""
    n, h, w, c = x.shape
    half = c // 2
    order = jnp.stack([jnp.arange(half), jnp.arange(half) + half], axis=1).reshape(-1)
    x = x[..., order]
    ch_per_head = c // headers
    xh = x.reshape(n, h * w, headers, ch_per_head)
    w_mask = params["conv_mask"]["weight"].reshape(ch_per_head).astype(x.dtype)
    b_mask = params["conv_mask"]["bias"].astype(x.dtype)
    mask = jax.nn.softmax(jnp.einsum("nphc,c->nph", xh, w_mask) + b_mask, axis=1)
    context = jnp.einsum("nphc,nph->nhc", xh, mask).reshape(n, c)
    cc = params["channel_mul_conv"]
    t = L.linear(context, cc["0"]["weight"].reshape(-1, c), cc["0"]["bias"])
    t = L.layer_norm(t, cc["1"]["weight"].reshape(-1), cc["1"]["bias"].reshape(-1), axes=(-1,))
    t = jnp.maximum(t, 0)
    t = L.linear(t, cc["3"]["weight"].reshape(-1, t.shape[-1]), cc["3"]["bias"])
    out = x * jax.nn.sigmoid(t)[:, None, None, :]
    return L.conv2d(out, params["out"]["weight"], params["out"]["bias"], padding=1)


def gc_attention_concat_apply(ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8):
    """fusion_type='channel_concat' (fusion_modules.py:66-73,144-155):
    context bottleneck -> concat broadcast -> 1x1 cat conv -> LayerNorm over
    (C, H, W) -> ReLU -> 3x3 out conv."""
    n, h, w, c = x.shape
    half = c // 2
    order = jnp.stack([jnp.arange(half), jnp.arange(half) + half], axis=1).reshape(-1)
    x = x[..., order]
    ch_per_head = c // headers
    xh = x.reshape(n, h * w, headers, ch_per_head)
    w_mask = params["conv_mask"]["weight"].reshape(ch_per_head).astype(x.dtype)
    b_mask = params["conv_mask"]["bias"].astype(x.dtype)
    mask = jax.nn.softmax(jnp.einsum("nphc,c->nph", xh, w_mask) + b_mask, axis=1)
    context = jnp.einsum("nphc,nph->nhc", xh, mask).reshape(n, c)
    cc = params["channel_concat_conv"]
    t = L.linear(context, cc["0"]["weight"].reshape(-1, c), cc["0"]["bias"])
    t = L.layer_norm(t, cc["1"]["weight"].reshape(-1), cc["1"]["bias"].reshape(-1), axes=(-1,))
    t = jnp.maximum(t, 0)
    t = L.linear(t, cc["3"]["weight"].reshape(-1, t.shape[-1]), cc["3"]["bias"])
    out = jnp.concatenate(
        [x, jnp.broadcast_to(t[:, None, None, :], (n, h, w, c))], axis=-1
    )
    out = L.conv2d(out, params["cat_conv"]["weight"], params["cat_conv"].get("bias"))
    # F.layer_norm over [C, H, W]: normalize jointly over channels+space.
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(out, axis=(1, 2, 3), keepdims=True)
    out = jnp.maximum((out - mean) / jnp.sqrt(var + 1e-5), 0)
    return L.conv2d(out, params["out"]["weight"], params["out"]["bias"], padding=1)


def simple_attention_apply(ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8):
    """SimpleAttention (fusion_modules.py:161-186): x * linear(x), 1x1 conv."""
    t = L.linear(x, params["linear"]["weight"]) * x
    return L.conv2d(t, params["conv"]["weight"])


def local_only_apply(ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8):
    """LocalOnly (fusion_modules.py:190-218): keep the local half."""
    return x[..., : x.shape[-1] // 2]


def conv1x1_fusion_apply(ctx: Ctx, params: dict, x: jnp.ndarray, headers: int = 8):
    """Conv1x1 (fusion_modules.py:222-247)."""
    return L.conv2d(x, params["conv"]["weight"])


FUSION_MODULES = {
    ("MultiAspectGCAttention", "channel_add"): gc_attention_apply,
    ("MultiAspectGCAttention", "channel_mul"): gc_attention_mul_apply,
    ("MultiAspectGCAttention", "channel_concat"): gc_attention_concat_apply,
    ("SimpleAttention", None): simple_attention_apply,
    ("LocalOnly", None): local_only_apply,
    ("Conv1x1", None): conv1x1_fusion_apply,
}


def apply_fusion(ctx: Ctx, params: dict, x: jnp.ndarray,
                 name: str = "MultiAspectGCAttention",
                 fusion_type: str = "channel_add", headers: int = 8):
    key = (name, fusion_type if name == "MultiAspectGCAttention" else None)
    if key not in FUSION_MODULES:
        raise NotImplementedError(f"fusion {name}/{fusion_type}")
    return FUSION_MODULES[key](ctx, params, x, headers)


def init_p2p3_fusion(key, channels: int = 256) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": {"weight": L.c2_msra_fill(k1, (1, 1, channels, channels))},
        "conv2": {"weight": L.c2_msra_fill(k2, (1, 1, channels, channels))},
    }


# Param subtree name for each GC fusion_type (matches the torch module
# attribute created in reference fusion_modules.py:60-79).
_GC_BOTTLENECK_NAME = {
    "channel_add": "channel_add_conv",
    "channel_mul": "channel_mul_conv",
    "channel_concat": "channel_concat_conv",
}


def init_gc_attention(
    key, inplanes: int = 512, ratio: float = 0.5, headers: int = 8,
    outplane: int = 256, fusion_type: str = "channel_add",
) -> dict:
    ks = jax.random.split(key, 5)
    planes = int(inplanes * ratio)
    single = inplanes // headers
    kw = 1.0 / (single**0.5)
    params = {
        "conv_mask": {
            "weight": jax.random.uniform(ks[0], (1, 1, single, 1), jnp.float32, -kw, kw),
            "bias": jnp.zeros((1,), jnp.float32),
        },
        _GC_BOTTLENECK_NAME[fusion_type]: {
            "0": {
                "weight": jax.random.uniform(
                    ks[1], (planes, inplanes), jnp.float32,
                    -1.0 / inplanes**0.5, 1.0 / inplanes**0.5,
                ),
                "bias": jnp.zeros((planes,), jnp.float32),
            },
            "1": {
                "weight": jnp.ones((planes, 1, 1), jnp.float32),
                "bias": jnp.zeros((planes, 1, 1), jnp.float32),
            },
            "3": {
                "weight": jax.random.uniform(
                    ks[2], (inplanes, planes), jnp.float32,
                    -1.0 / planes**0.5, 1.0 / planes**0.5,
                ),
                "bias": jnp.zeros((inplanes,), jnp.float32),
            },
        },
        "out": {
            "weight": jax.random.uniform(
                ks[3], (3, 3, inplanes, outplane), jnp.float32,
                -1.0 / (9 * inplanes) ** 0.5, 1.0 / (9 * inplanes) ** 0.5,
            ),
            "bias": jnp.zeros((outplane,), jnp.float32),
        },
    }
    if fusion_type == "channel_concat":
        kc = 1.0 / (2 * inplanes) ** 0.5
        params["cat_conv"] = {
            "weight": jax.random.uniform(
                ks[4], (1, 1, 2 * inplanes, inplanes), jnp.float32, -kc, kc
            ),
            "bias": jnp.zeros((inplanes,), jnp.float32),
        }
    return params


def init_fusion(
    key, name: str = "MultiAspectGCAttention", fusion_type: str = "channel_add",
    inplanes: int = 512, ratio: float = 0.5, headers: int = 8, outplane: int = 256,
) -> dict:
    """Init the param tree for the configured fusion module (any variant)."""
    if name == "MultiAspectGCAttention":
        return init_gc_attention(key, inplanes, ratio, headers, outplane, fusion_type)
    if name == "SimpleAttention":
        k1, k2 = jax.random.split(key)
        kl = 1.0 / inplanes**0.5
        return {
            "linear": {"weight": jax.random.uniform(
                k1, (inplanes, inplanes), jnp.float32, -kl, kl)},
            "conv": {"weight": L.c2_msra_fill(k2, (1, 1, inplanes, outplane))},
        }
    if name == "LocalOnly":
        return {}
    if name == "Conv1x1":
        return {"conv": {"weight": L.c2_msra_fill(key, (1, 1, inplanes, outplane))}}
    raise NotImplementedError(f"fusion init {name}")
