"""Functional neural-net primitives with pytree parameters.

Models in this framework are plain functions over nested-dict parameter
pytrees (converter-friendly: the tree structure mirrors the reference
checkpoints' module paths).  Conventions:

* activations are NHWC, conv kernels HWIO (TPU-native layouts; the
  checkpoint converter transposes torch's OIHW),
* batch-norm folds running stats at inference; at training time it computes
  batch statistics, optionally ``psum``-ed over a named mesh axis
  (``axis_name``) — the TPU equivalent of the reference's SyncBN,
* recurrent cells keep the torch gate memory layout so converted LSTM/GRU
  weights drop in unchanged (replacing cuDNN RNNs with ``lax.scan``).

Initializers mirror the reference where it specifies them (caffe2 MSRA fill
for convs, normal(0.01) for heads).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def c2_msra_fill(key, shape):
    """caffe2 MSRA (kaiming normal, fan_out, relu) for HWIO conv kernels."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, jnp.float32)


def normal_init(key, shape, std=0.01):
    return std * jax.random.normal(key, shape, jnp.float32)


def caffe2_xavier(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    std = math.sqrt(1.0 / fan_in)
    return std * jax.random.normal(key, shape, jnp.float32)


# ---------------------------------------------------------------------------
# conv / linear / pooling
# ---------------------------------------------------------------------------


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int | str = 0,
    dilation: Sequence[int] | int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """NHWC conv with HWIO weights (torch-style integer padding)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, (tuple, list)) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = jax.lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=tuple(stride),
        padding=padding,
        rhs_dilation=tuple(dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 2,
) -> jnp.ndarray:
    """NHWC transposed conv matching torch ``ConvTranspose2d`` semantics.

    ``weight`` is HWIO in the layout of the forward conv whose gradient this
    computes: I = the deconv's *output* channels (convert torch's
    (in, out, kh, kw) via ``transpose(2, 3, 1, 0)``).
    """
    out = jax.lax.conv_transpose(
        x,
        weight.astype(x.dtype),
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None):
    """torch layout: weight (out, in)."""
    out = x @ weight.astype(x.dtype).T
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _max_pool_fwd_raw(x, kernel, stride, padding):
    pads = ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0))
    # -inf (not finfo.min) so XLA recognizes the max-pool pattern.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kernel[0], kernel[1], 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=pads,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool2d_densegrad(x, kernel, stride, padding):
    """reduce_window max forward + a dense backward.

    XLA's native max-pool VJP is SelectAndScatter — measured slow on TPU
    (the stem pool's fwd+bwd was ~6 ms/step of the 1024² train step).  The
    replacement backward routes each output's cotangent to its window's
    FIRST maximum (row-major scan order — SelectAndScatter's exact tie
    rule, verified against jax.grad on CPU) using only strided slices,
    compares and static pads: per window offset k, the winner mask is
    ``w_k == y`` minus any earlier-offset winner, and the cotangent is
    placed back with an interior-dilated pad.  All dense, fusable, no
    scatter.  (Distinct from the rejected max-CHAIN variant, which changed
    the forward itself: 115.5 -> 122.8 ms/step.  This keeps the forward.)
    """
    return _max_pool_fwd_raw(x, kernel, stride, padding)


def _max_pool2d_densegrad_fwd(x, kernel, stride, padding):
    y = _max_pool_fwd_raw(x, kernel, stride, padding)
    return y, (x, y)


def _max_pool2d_densegrad_bwd(kernel, stride, padding, res, dy):
    x, y = res
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    n, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    hp, wp = h + 2 * ph, w + 2 * pw
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), constant_values=neg)

    taken = jnp.zeros(y.shape, jnp.bool_)
    dxp = jnp.zeros((n, hp, wp, c), dy.dtype)
    for i in range(kh):
        for j in range(kw):
            wk = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (n, i + sh * (ho - 1) + 1, j + sw * (wo - 1) + 1, c),
                (1, sh, sw, 1),
            )
            win = (wk == y) & ~taken
            taken = taken | win
            gk = jnp.where(win, dy, 0)
            dxp = dxp + jax.lax.pad(
                gk,
                jnp.asarray(0, dy.dtype),
                (
                    (0, 0, 0),
                    (i, hp - (i + sh * (ho - 1) + 1), sh - 1),
                    (j, wp - (j + sw * (wo - 1) + 1), sw - 1),
                    (0, 0, 0),
                ),
            )
    dx = dxp[:, ph : ph + h, pw : pw + w, :]
    return (dx,)


_max_pool2d_densegrad.defvjp(_max_pool2d_densegrad_fwd, _max_pool2d_densegrad_bwd)


def max_pool2d(
    x: jnp.ndarray,
    kernel: Sequence[int] | int,
    stride: Sequence[int] | int | None = None,
    padding: Sequence[int] | int = 0,
) -> jnp.ndarray:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if stride is None:
        stride = kernel
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    # GLASS_TPU_MAXPOOL_VJP selects the backward: "sas" = XLA's native
    # SelectAndScatter (measured default: 91.0 vs 97.4 ms/step for the
    # dense custom VJP on the pinned v5e train bench, interleaved A/B,
    # PERF_NOTES round 4), "dense" = the one-hot dense-gradient VJP
    # (kept as an A/B escape hatch; exactness-tested in
    # tests/test_maxpool_vjp.py).
    if jnp.issubdtype(x.dtype, jnp.floating) and (
        os.environ.get("GLASS_TPU_MAXPOOL_VJP", "sas") == "dense"
    ):
        return _max_pool2d_densegrad(x, tuple(kernel), tuple(stride), tuple(padding))
    return _max_pool_fwd_raw(x, kernel, stride, padding)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def batch_norm(
    x: jnp.ndarray,
    params: dict,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis_name: Optional[str] = None,
):
    """BatchNorm over all but the channel (last) axis.

    params: {weight, bias, running_mean, running_var}.

    Returns ``out`` at inference; ``(out, new_params)`` at training, where
    running stats were EMA-updated.  With ``axis_name`` set, batch statistics
    are psum-averaged over that mesh axis (SyncBN).
    """
    w = params["weight"]
    b = params["bias"]
    if not train:
        mean = params["running_mean"]
        var = params["running_var"]
        scale = (w / jnp.sqrt(var + eps)).astype(x.dtype)
        shift = (b - mean * w / jnp.sqrt(var + eps)).astype(x.dtype)
        return x * scale + shift

    red_axes = tuple(range(x.ndim - 1))
    # f32 accumulators WITHOUT materializing an f32 copy of the (large)
    # activation: each reduction carries its own fused per-element convert
    # (a shared `x.astype(f32)` temp measured as extra full passes over
    # ~300 MB of backbone activations per step).
    mean = jnp.mean(x, axis=red_axes, dtype=jnp.float32)
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=red_axes
    )
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - mean**2
    inv = w / jnp.sqrt(var + eps)
    out = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + b.astype(x.dtype)

    n = np.prod([x.shape[a] for a in red_axes])
    unbiased = var * n / max(n - 1, 1)
    new_params = dict(params)
    new_params["running_mean"] = (1 - momentum) * params["running_mean"] + momentum * mean
    new_params["running_var"] = (1 - momentum) * params["running_var"] + momentum * unbiased
    return out, new_params


def layer_norm(x: jnp.ndarray, weight, bias, axes: Tuple[int, ...], eps: float = 1e-5):
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps)
    return out * weight.astype(x.dtype) + bias.astype(x.dtype)


def init_bn(channels: int) -> dict:
    return {
        "weight": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
        "running_mean": jnp.zeros((channels,), jnp.float32),
        "running_var": jnp.ones((channels,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# recurrent cells (torch memory layout, lax.scan time loops)
# ---------------------------------------------------------------------------


def lstm_layer(
    x: jnp.ndarray,
    params: dict,
    reverse: bool = False,
) -> jnp.ndarray:
    """Single-direction LSTM over (B, T, I) -> (B, T, H).

    params (torch layout): weight_ih (4H, I), weight_hh (4H, H),
    bias_ih (4H,), bias_hh (4H,).  Gate order: i, f, g, o.
    """
    w_ih = params["weight_ih"].astype(x.dtype)
    w_hh = params["weight_hh"].astype(x.dtype)
    bias = (params["bias_ih"] + params["bias_hh"]).astype(x.dtype)
    hidden = w_hh.shape[1]
    b = x.shape[0]

    # Hoist the input projection out of the scan: one big MXU matmul.
    x_proj = jnp.einsum("bti,gi->btg", x, w_ih) + bias

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((b, hidden), x.dtype),
        jnp.zeros((b, hidden), x.dtype),
    )
    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def bilstm(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Bidirectional LSTM: params {fwd: {...}, bwd: {...}} -> (B, T, 2H).

    Both directions run in ONE ``lax.scan`` (the backward direction
    processes time-reversed inputs with its own weights via a batched
    einsum), halving the number of sequential scan steps — these tiny
    per-step matmuls are launch-overhead bound on TPU, not FLOP bound.
    """
    fp, bp = params["fwd"], params["bwd"]
    w_hh = jnp.stack(
        [fp["weight_hh"], bp["weight_hh"]], axis=0
    ).astype(x.dtype)  # (2, 4H, H)
    hidden = w_hh.shape[2]
    b, t = x.shape[0], x.shape[1]

    def proj(p):
        return jnp.einsum("bti,gi->btg", x, p["weight_ih"].astype(x.dtype)) + (
            p["bias_ih"] + p["bias_hh"]
        ).astype(x.dtype)

    xp_f = proj(fp)
    xp_b = proj(bp)[:, ::-1]  # backward direction reads time-reversed input
    xs = jnp.stack([xp_f, xp_b], axis=0)  # (2, B, T, 4H)
    xs = jnp.moveaxis(xs, 2, 0)  # (T, 2, B, 4H)

    def step(carry, xp):
        h, c = carry  # (2, B, H)
        gates = xp + jnp.einsum("dbh,dgh->dbg", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((2, b, hidden), x.dtype),
        jnp.zeros((2, b, hidden), x.dtype),
    )
    _, hs = jax.lax.scan(step, init, xs)  # (T, 2, B, H)
    fwd = jnp.moveaxis(hs[:, 0], 0, 1)  # (B, T, H)
    bwd = jnp.moveaxis(hs[:, 1], 0, 1)[:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


def gru_cell(
    x: jnp.ndarray,
    h: jnp.ndarray,
    params: dict,
) -> jnp.ndarray:
    """One GRU step (B, I), (B, H) -> (B, H); torch gate order r, z, n.

    torch semantics: n = tanh(W_in x + b_in + r * (W_hn h + b_hn)).
    """
    w_ih = params["weight_ih"].astype(x.dtype)
    w_hh = params["weight_hh"].astype(x.dtype)
    b_ih = params["bias_ih"].astype(x.dtype)
    b_hh = params["bias_hh"].astype(x.dtype)
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def init_lstm(key, input_size: int, hidden: int) -> dict:
    """Orthogonal matrices / normal biases as in reference recognizer_encoder.py:130-134."""
    ks = jax.random.split(key, 6)

    def orth(k, shape):
        a = jax.random.normal(k, shape, jnp.float32)
        q, r = jnp.linalg.qr(a.T if shape[0] < shape[1] else a)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        return (q.T if shape[0] < shape[1] else q)[: shape[0], : shape[1]]

    def direction(k1, k2, k3):
        return {
            "weight_ih": orth(k1, (4 * hidden, input_size)),
            "weight_hh": orth(k2, (4 * hidden, hidden)),
            "bias_ih": normal_init(k3, (4 * hidden,), 1.0),
            "bias_hh": jnp.zeros((4 * hidden,), jnp.float32),
        }

    return {"fwd": direction(ks[0], ks[1], ks[2]), "bwd": direction(ks[3], ks[4], ks[5])}


def init_gru(key, input_size: int, hidden: int) -> dict:
    ks = jax.random.split(key, 4)
    k_in = 1.0 / math.sqrt(hidden)
    return {
        "weight_ih": jax.random.uniform(ks[0], (3 * hidden, input_size), jnp.float32, -k_in, k_in),
        "weight_hh": jax.random.uniform(ks[1], (3 * hidden, hidden), jnp.float32, -k_in, k_in),
        "bias_ih": jax.random.uniform(ks[2], (3 * hidden,), jnp.float32, -k_in, k_in),
        "bias_hh": jax.random.uniform(ks[3], (3 * hidden,), jnp.float32, -k_in, k_in),
    }
