#!/usr/bin/env python
"""Pinned training-step benchmark (the PERF_NOTES ms/step numbers).

Methodology (PERF_NOTES.md "Measurement methodology"): a 10-step
pipelined window — all steps dispatched asynchronously, only the last
loss fetched — so the tunnel's ~3 ms dispatch / ~30 ms fetch overhead is
amortized away and the number is device time.  SynthText pretrain
config, b=1 per chip, 1024x1024, full losses (mask rasterization +
recognizer teacher forcing), realistic gt density (default G=24 real
words out of the 256-slot capacity).

Usage:
    python tools/train_bench.py [--gts N] [--batch B] [--steps K]
        [--opts KEY VALUE ...]

Lives in-repo (not /tmp) so the pinned methodology survives host resets.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from glass_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def make_batch(b, h, w, g_real, g_cap, max_word_len, seed=0):
    rng = np.random.RandomState(seed)
    from glass_tpu.ops.boxes import boxes_to_polygons

    boxes = np.stack(
        [
            rng.uniform(64, w - 64, (b, g_cap)),
            rng.uniform(64, h - 64, (b, g_cap)),
            rng.uniform(24, 180, (b, g_cap)),
            rng.uniform(10, 40, (b, g_cap)),
            rng.uniform(-60, 60, (b, g_cap)),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = np.zeros((b, g_cap), bool)
    valid[:, :g_real] = True
    text = np.zeros((b, g_cap, max_word_len + 2), np.int64)
    text[..., 1:6] = rng.randint(1, 60, (b, g_cap, 5))
    text[..., 6] = 0
    polys4 = np.asarray(boxes_to_polygons(boxes))
    k = 16
    polys = np.zeros((b, g_cap, k, 2), np.float32)
    polys[:, :, :4] = polys4
    return {
        "images": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "content_hw": np.tile([[h, w]], (b, 1)).astype(np.int32),
        "gt_boxes": boxes,
        "gt_valid": valid,
        "gt_classes": np.zeros((b, g_cap), np.int32),
        "gt_orientation": rng.randint(0, 4, (b, g_cap)).astype(np.int32),
        "gt_text": text,
        "gt_polygons": polys,
        "gt_poly_nv": np.full((b, g_cap), 4, np.int32),
    }


def build(gts=24, batch=1, size=1024, opts=()):
    """Build the pinned benchmark's step program + inputs WITHOUT timing.

    Returns a dict with the compiled pieces so callers (the interleaved
    stage/knockout tools) can warm every variant first and then time them
    round-robin in one process — the methodology that removed the ±20 ms
    cross-session tunnel variance in round 4 (PERF_NOTES).
    """
    from glass_tpu.config import get_cfg

    cfg = get_cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs", "glass_pretrain.yaml")
    )
    if opts:
        cfg.merge_from_list(list(opts))

    import optax

    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.parallel import make_mesh, shard_batch, make_parallel_train_step
    from glass_tpu.train.train_step import TrainConfig, glass_train_forward

    arch = GlassArch.from_config(cfg)
    tcfg = TrainConfig.from_config(cfg)
    params = init_glass_params(jax.random.PRNGKey(0), arch)
    mesh = make_mesh(jax.devices()[:batch] or jax.devices())
    tx = optax.sgd(1e-3, momentum=0.9)

    def loss_fn(p, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        total, losses, bn = glass_train_forward(
            arch, tcfg, p, batch, key, axis_name="data"
        )
        return total, (losses, bn)

    step = make_parallel_train_step(mesh, loss_fn, tx)

    g_cap = cfg.TPU.MAX_GT_INSTANCES
    data = make_batch(batch, size, size, gts, g_cap, arch.max_word_len)
    data = shard_batch(mesh, data)
    opt_state = tx.init(params)
    return dict(
        cfg=cfg, arch=arch, tcfg=tcfg, params=params, opt_state=opt_state,
        data=data, step=step, mesh=mesh, tx=tx, batch=batch,
    )


def measure(
    gts=24, batch=1, steps=10, size=1024, opts=(), with_flops=False,
    ingraph=None, windows=1,
):
    """Run the pinned train-step benchmark; returns a result dict.

    with_flops: also read the XLA cost analysis of the compiled step
    (analytic FLOPs) so callers can derive MFU = flops / time / peak.

    ingraph: run the ``steps`` iterations as ONE jit program with the
    params/opt_state feedback internal to the program (lax.fori_loop
    carry) instead of a host-dispatched loop.  Default: on for TPU, off
    for CPU.  Equivalent device work per step; immune to the tunnel
    runtime's host round-trip of fed-back outputs (PERF_NOTES round 4 —
    the dispatched loop measured 12-52 s/step of pure tunnel transfer on
    an otherwise healthy chip).
    """
    built = build(gts, batch, size, opts)
    cfg, step = built["cfg"], built["step"]
    params, opt_state, data = built["params"], built["opt_state"], built["data"]
    mesh = built["mesh"]
    key = jax.random.PRNGKey(1)

    if ingraph is None:
        ingraph = jax.default_backend() != "cpu"
    if ingraph:
        from glass_tpu.parallel.mesh import make_parallel_train_loop

        # (make_parallel_train_loop does not donate its inputs, so each
        # window may re-feed the same params/opt_state arrays.)
        loop = make_parallel_train_loop(step, steps)
        p, o, metrics = loop(params, opt_state, data, key)  # warmup/compile
        np.asarray(metrics["total_loss"])
        # Each window = one dispatch + one scalar fetch; the best of
        # ``windows`` trials strips the residual per-dispatch tunnel
        # overhead (device time is a hard lower bound).
        window_ms = []
        for wi in range(max(1, windows)):
            t0 = time.perf_counter()
            p2, o2, metrics = loop(
                params, opt_state, data, jax.random.fold_in(key, 7 + wi)
            )
            np.asarray(metrics["total_loss"])  # fetch: the only true barrier
            window_ms.append((time.perf_counter() - t0) / steps * 1e3)
        dt = min(window_ms)
    else:
        # host-dispatched loop (the pre-round-4 methodology)
        params, opt_state, metrics = step(params, opt_state, data, key)
        np.asarray(metrics["total_loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            params, opt_state, metrics = step(
                params, opt_state, data, jax.random.fold_in(key, i)
            )
        np.asarray(metrics["total_loss"])
        dt = (time.perf_counter() - t0) / steps * 1e3
    result = {
        "ms_per_step": dt,
        "ips_per_chip": batch / (dt / 1e3) / max(1, len(mesh.devices.flat)),
        "batch": batch,
        "size": size,
        "gts": gts,
        "match_backend": cfg.TPU.MATCH_BACKEND,
        "rpn_sampler": cfg.TPU.RPN_SAMPLER,
        "maxpool_vjp": os.environ.get("GLASS_TPU_MAXPOOL_VJP", "sas"),
    }
    if with_flops:
        try:
            analysis = step.lower(params, opt_state, data, key).compile().cost_analysis()
            if isinstance(analysis, (list, tuple)):
                analysis = analysis[0]
            result["flops"] = float(analysis.get("flops", 0.0))
        except Exception:
            result["flops"] = None
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gts", type=int, default=24)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--opts", nargs="*", default=[])
    ap.add_argument("--dispatched", action="store_true",
                    help="force the host-dispatched step loop")
    args = ap.parse_args()
    r = measure(args.gts, args.batch, args.steps, args.size, args.opts,
                ingraph=False if args.dispatched else None)
    print(
        f"train_step: {r['ms_per_step']:.1f} ms/step  (b={r['batch']}, "
        f"{r['size']}x{r['size']}, G={r['gts']}, backend={r['match_backend']}, "
        f"sampler={r['rpn_sampler']}, maxpool_vjp={r['maxpool_vjp']})"
    )


if __name__ == "__main__":
    main()
