"""Localize the ResNet backward cost per stage and per gradient kind.

The round-5 train stage table shows ``resnet_bwd`` = 23 ms at 8% MFU
(vs 18.4% fwd). This tool splits that by stage (stem/res2..res5) and by
gradient kind (dX-only vs dX+dW), each as ONE chained ``lax.fori_loop``
jit program (tunnel-immune, see PERF_NOTES.md), so the dW-layout levers
parked since round 2 can be aimed at the actual sink.

Per stage it times:
  * fwd            — stage forward (train-mode BN)
  * fwd+dX         — grad wrt the stage INPUT only (dW convs dropped by XLA)
  * fwd+dX+dW      — grad wrt (params, input): the real train backward
  * dW extra       — (fwd+dX+dW) - (fwd+dX): pure filter-gradient cost

Usage: python tools/backbone_bwd_breakdown.py [--size 1024] [--trials 3]
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


def _stage_fns(size):
    """Returns [(name, apply(params, x) -> scalar, param_subtree, x_shape)]."""
    key = jax.random.PRNGKey(0)
    params = R.init_resnet50(key)
    s = size

    def stem_apply(p, x):
        ctx = Ctx(train=True)
        out = R._stem_conv_s2d(ctx, x, p["conv1"], "stem.conv1")
        return L.max_pool2d(out, 3, 2, 1)

    def make_stage(name, n_blocks, stride):
        def apply(p, x):
            ctx = Ctx(train=True)
            out = x
            for i in range(n_blocks):
                out = R.bottleneck_block(
                    ctx, out, p[str(i)], f"{name}.{i}", stride if i == 0 else 1
                )
            return out

        return apply

    stages = [("stem", stem_apply, params["stem"], (1, s, s, 3))]
    in_hw, in_c = s // 4, 64
    for name, n_blocks, _, out_c, stride in R.RESNET50_STAGES:
        stages.append(
            (
                name,
                make_stage(name, n_blocks, stride),
                params[name],
                (1, in_hw, in_hw, in_c),
            )
        )
        in_hw, in_c = in_hw // stride, out_c
    return stages


def _chain(fn):
    """K dependency-chained reps of fn(p, x) -> f32 scalar, one jit."""

    @jax.jit
    def run(p, x):
        def body(i, acc):
            return acc + fn(p, x + acc.astype(x.dtype) * 1e-12)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def _time(run, p, x, trials):
    np.asarray(run(p, x))  # compile + warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(run(p, x))
        ts.append((time.perf_counter() - t0) / K * 1e3)
    return min(ts)


def _flops(fn, p, x):
    try:
        a = jax.jit(fn).lower(p, x).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    rows = []
    for name, apply, p_sub, x_shape in _stage_fns(args.size):
        x = jnp.asarray(
            np.random.RandomState(0).randn(*x_shape).astype(np.float32),
            jnp.bfloat16,
        )

        def loss(p, xx):
            return jnp.sum(apply(p, xx).astype(jnp.float32))

        fwd = _chain(loss)
        gx = _chain(lambda p, xx: jnp.sum(jax.grad(loss, argnums=1)(p, xx).astype(jnp.float32)))

        def gboth_scalar(p, xx):
            gp, gxx = jax.grad(loss, argnums=(0, 1))(p, xx)
            acc = jnp.sum(gxx.astype(jnp.float32))
            return acc + sum(
                jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(gp)
            )

        gboth = _chain(gboth_scalar)

        t_fwd = _time(fwd, p_sub, x, args.trials)
        t_gx = _time(gx, p_sub, x, args.trials)
        t_both = _time(gboth, p_sub, x, args.trials)
        fl_both = _flops(gboth_scalar, p_sub, x)
        mfu = (
            round(fl_both / ((t_both) / 1e3) / V5E_PEAK_FLOPS, 4)
            if fl_both and jax.default_backend() != "cpu"
            else None
        )
        row = {
            "stage": name,
            "fwd_ms": round(t_fwd, 2),
            "fwd_dx_ms": round(t_gx, 2),
            "fwd_dx_dw_ms": round(t_both, 2),
            "dw_extra_ms": round(t_both - t_gx, 2),
            "bwd_ms": round(t_both - t_fwd, 2),
            "full_gflops": round(fl_both / 1e9, 1) if fl_both else None,
            "full_mfu": mfu,
        }
        rows.append(row)
        print(
            f"{name:6s} fwd {row['fwd_ms']:6.2f}  +dX {row['fwd_dx_ms']:6.2f}  "
            f"+dX+dW {row['fwd_dx_dw_ms']:6.2f}  dW-extra {row['dw_extra_ms']:6.2f}  "
            f"bwd {row['bwd_ms']:6.2f}  MFU(full) {row['full_mfu']}",
            flush=True,
        )

    print(json.dumps({"size": args.size, "k": K, "stages": rows}))


if __name__ == "__main__":
    main()
