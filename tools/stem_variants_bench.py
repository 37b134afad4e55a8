"""A/B the stem-conv formulation for the TRAIN path (fwd + dW only).

The round-5 in-situ freeze sweep puts the stem at 9.7 ms of the 89 ms
train step at 0.6% MFU (records/freeze_sweep_insitu_r5.log).  This tool
times candidate formulations of the stem block (conv -> train-BN -> relu
-> maxpool3x3s2) under the gradient structure the real step has: grad wrt
PARAMS only (the image cotangent is dead — never built by JAX's
transpose), K-rep chained in one jit (tunnel-immune).

Variants:
  * s2d        — current default: 2x2 space-to-depth reparametrization
                 (resnet._stem_conv_s2d)
  * plain      — direct conv7x7/2 NHWC
  * s2d_f32    — s2d with the conv in f32 (bf16 small-channel suspicion)
  * plain_nchw — direct conv with NCHW dimension numbers

Usage: python tools/stem_variants_bench.py [--size 1024] [--trials 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from glass_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from glass_tpu.models import resnet as R
from glass_tpu.models import layers as L
from glass_tpu.models.context import Ctx

V5E_PEAK_FLOPS = 197e12
K = int(os.environ.get("GLASS_PROFILE_K", "20"))


def _stem_params():
    key = jax.random.PRNGKey(0)
    return R.init_resnet50(key)["stem"]


def _bn_relu_pool(ctx, out, p):
    from glass_tpu.models.context import apply_bn

    if "norm" in p["conv1"]:
        out = apply_bn(ctx, out, p["conv1"]["norm"], "stem.conv1.norm")
    out = jnp.maximum(out, 0)
    return L.max_pool2d(out, 3, 2, 1)


def variant_s2d(p, x):
    ctx = Ctx(train=True)
    out = R._stem_conv_s2d(ctx, x, p["conv1"], "stem.conv1")
    return L.max_pool2d(out, 3, 2, 1)


def variant_plain(p, x):
    ctx = Ctx(train=True)
    out = L.conv2d(x, p["conv1"]["weight"], p["conv1"].get("bias"),
                   stride=2, padding=3)
    return _bn_relu_pool(ctx, out, p)


def variant_s2d_f32(p, x):
    ctx = Ctx(train=True)
    out = R._stem_conv_s2d(ctx, x.astype(jnp.float32), p["conv1"], "stem.conv1")
    return L.max_pool2d(out.astype(x.dtype), 3, 2, 1)


def variant_plain_nchw(p, x):
    ctx = Ctx(train=True)
    xn = jnp.transpose(x, (0, 3, 1, 2))
    w = p["conv1"]["weight"]  # HWIO
    out = jax.lax.conv_general_dilated(
        xn, w.astype(x.dtype), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    )
    out = jnp.transpose(out, (0, 2, 3, 1))
    if p["conv1"].get("bias") is not None:
        out = out + p["conv1"]["bias"].astype(out.dtype)
    return _bn_relu_pool(ctx, out, p)


def _s2d4_selection():
    """S[B, r, s, j] = 1 iff tap j of the 7-tap kernel lands at block B,
    sub-position r for output phase s: j == 4B + r - 1 - 2s."""
    B = np.arange(3)[:, None, None, None]
    r = np.arange(4)[None, :, None, None]
    s = np.arange(2)[None, None, :, None]
    j = np.arange(7)[None, None, None, :]
    return (j == 4 * B + r - 1 - 2 * s).astype(np.float32)


def variant_s2d4(p, x):
    """7x7/2 stem as a 3x3 conv over the 4x4-space-to-depth'd image.

    y[2m+s] = sum_j x[4m+2s-3+j] w[j] reads blocks m-1..m+1 of the
    4-strided image for both phases s in {0,1}, so the conv becomes
    kernel-3 stride-1 over 16*cin block channels producing 4*cout phase
    channels, followed by depth-to-space(2).  Exact math; contraction
    shape per position K=3*3*48=432 -> N=256 (vs s2d(2)'s K=768 ->
    N=64): four full MXU result tiles instead of half of one.
    """
    ctx = Ctx(train=True)
    w = p["conv1"]["weight"]  # (7,7,ci,co)
    ci, co = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    assert h % 4 == 0 and wd % 4 == 0
    S = jnp.asarray(_s2d4_selection(), w.dtype)  # (3,4,2,7)
    # W4[Bh,rh,sh, Bw,rw,sw, ci,co] summed over the 7x7 taps
    W4 = jnp.einsum("arsj,bqtk,jkio->abrqisto", S, S, w)
    W4 = W4.reshape(3, 3, 4, 4, ci, 2, 2, co).reshape(3, 3, 16 * ci, 4 * co)
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    hb, wb = (h + 8) // 4, (wd + 8) // 4
    X = (
        xp.reshape(n, hb, 4, wb, 4, ci)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hb, wb, 16 * ci)
    )
    out = L.conv2d(X, W4, None, stride=1, padding=0)  # (n, h/4, w/4, 4co)
    m, nn = out.shape[1], out.shape[2]
    out = (
        out.reshape(n, m, nn, 2, 2, co)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * m, 2 * nn, co)
    )
    if p["conv1"].get("bias") is not None:
        out = out + p["conv1"]["bias"].astype(out.dtype)
    return _bn_relu_pool(ctx, out, p)


VARIANTS = [
    ("s2d", variant_s2d),
    ("plain", variant_plain),
    ("s2d_f32", variant_s2d_f32),
    ("plain_nchw", variant_plain_nchw),
    ("s2d4", variant_s2d4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    p = _stem_params()
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, args.size, args.size, 3)
        .astype(np.float32),
        jnp.bfloat16,
    )

    runs = {}
    for name, apply in VARIANTS:
        def loss(pp, xx, apply=apply):
            out = apply(pp, xx)
            # train-BN returns (out, new_params) tuples inside apply_bn's
            # functional context handling; stem fns above return arrays
            return jnp.sum(out.astype(jnp.float32))

        def dw_scalar(pp, xx, loss=loss):
            g = jax.grad(loss, argnums=0)(pp, xx)
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(g)
            )

        @jax.jit
        def chained(pp, xx, dw_scalar=dw_scalar):
            def body(i, acc):
                return acc + dw_scalar(pp, xx + acc.astype(xx.dtype) * 1e-12)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        runs[name] = (chained, dw_scalar)
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        np.asarray(chained(p, x))

    rows = []
    times = {n: [] for n, _ in VARIANTS}
    for t in range(args.trials):
        for name, _ in VARIANTS:
            t0 = time.perf_counter()
            np.asarray(runs[name][0](p, x))
            times[name].append((time.perf_counter() - t0) / K * 1e3)
        print(
            f"trial {t}: "
            + "  ".join(f"{n}={times[n][-1]:.2f}ms" for n, _ in VARIANTS),
            flush=True,
        )
    for name, _ in VARIANTS:
        ms = min(times[name])
        try:
            a = jax.jit(runs[name][1]).lower(p, x).compile().cost_analysis()
            if isinstance(a, (list, tuple)):
                a = a[0]
            fl = float(a.get("flops", 0.0))
        except Exception:
            fl = None
        rows.append({
            "variant": name, "fwd_dw_ms": round(ms, 2),
            "gflops": round(fl / 1e9, 1) if fl else None,
            "mfu": round(fl / (ms / 1e3) / V5E_PEAK_FLOPS, 4)
            if fl and jax.default_backend() != "cpu" else None,
        })
        print(f"{name:12s} fwd+dW {ms:6.2f} ms", flush=True)
    print(json.dumps({"size": args.size, "k": K, "variants": rows}))


if __name__ == "__main__":
    main()
