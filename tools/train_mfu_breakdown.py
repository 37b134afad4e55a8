"""Per-stage MFU table for the TRAINING step (the serve-table analog).

The whole-step train MFU (bench.py ``train_mfu``) hides where the
86.8 ms/step goes. This tool decomposes it two ways, all in ONE process
with interleaved timing rounds (the round-4 A/B methodology — removes
cross-session tunnel variance):

* **Knockouts** — the full step re-measured with one branch disabled via
  config; the delta is that branch's true in-context marginal cost
  (fwd+bwd+its optimizer slice), which is what a default flip would
  actually buy (round-4 lesson: standalone stage wins can lose as frames):
    - ``MODEL.BACKBONE.FREEZE_AT 5``  -> no ResNet backward (dW+dX)
    - ``MODEL.MASK_ON False``         -> no mask branch
    - ``MODEL.RECOGNIZER_ON False``   -> no recognizer branch
* **Standalone stages** — backbone train-forward and the SGD update, to
  split the freeze delta into fwd vs bwd and bound the optimizer cost.

ΔFLOPs come from XLA cost analysis of each compiled variant, so each row
carries its own MFU = Δflops / Δtime / v5e bf16 peak.

Usage: python tools/train_mfu_breakdown.py [--steps 10] [--trials 3]
Prints a table + one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from glass_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import train_bench

V5E_PEAK_FLOPS = 197e12

VARIANTS = [
    ("full", []),
    ("no_resnet_bwd(FREEZE_AT=5)", ["MODEL.BACKBONE.FREEZE_AT", "5"]),
    ("no_mask_branch", ["MODEL.MASK_ON", "False"]),
    ("no_recognizer_branch", ["MODEL.RECOGNIZER_ON", "False"]),
]


def _prep_variant(opts, steps):
    from glass_tpu.parallel.mesh import make_parallel_train_loop

    built = train_bench.build(opts=list(opts))
    loop = make_parallel_train_loop(built["step"], steps)
    key = jax.random.PRNGKey(1)
    args = (built["params"], built["opt_state"], built["data"], key)
    _, _, metrics = loop(*args)  # compile + warm
    np.asarray(metrics["total_loss"])
    flops = None
    try:
        analysis = built["step"].lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        pass
    return dict(loop=loop, args=args, flops=flops, built=built)


def _time_variant(v, steps):
    p, o, d, key = v["args"]
    t0 = time.perf_counter()
    _, _, metrics = v["loop"](p, o, d, jax.random.fold_in(key, 7))
    np.asarray(metrics["total_loss"])
    return (time.perf_counter() - t0) / steps * 1e3


def standalone_stages(built, trials):
    """backbone train-forward + SGD update, chained-in-graph."""
    from glass_tpu.models import glass_rcnn as G

    arch, params = built["arch"], built["params"]
    image = jnp.asarray(np.asarray(built["data"]["images"][:1]))
    k = 10

    @jax.jit
    def bb_loop(p, img):
        def body(i, acc):
            ctx = G.Ctx(train=True)
            f = G.backbone_features(
                ctx, arch, p, G.preprocess(arch, img + acc * 1e-12)
            )
            return acc + sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(f)
            )

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def bb_once(p, img):
        ctx = G.Ctx(train=True)
        return G.backbone_features(ctx, arch, p, G.preprocess(arch, img))

    np.asarray(bb_loop(params, image))
    t = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(bb_loop(params, image))
        t.append((time.perf_counter() - t0) / k * 1e3)
    bb_fwd_ms = min(t)
    try:
        analysis = jax.jit(bb_once).lower(params, image).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        bb_fwd_flops = float(analysis.get("flops", 0.0))
    except Exception:
        bb_fwd_flops = None

    # SGD momentum update over the whole param tree (bandwidth-bound)
    tx = built["tx"]
    grads = jax.tree_util.tree_map(lambda x: x * 1e-3, params)

    import optax

    @jax.jit
    def opt_loop(p, o, g):
        def body(i, carry):
            p, o = carry
            g2 = jax.tree_util.tree_map(
                lambda x: x * (1.0 + jnp.float32(i) * 1e-12), g
            )
            up, o2 = tx.update(g2, o, p)
            return optax.apply_updates(p, up), o2

        p2, _ = jax.lax.fori_loop(0, k, body, (p, o))
        return jnp.sum(jax.tree_util.tree_leaves(p2)[0].astype(jnp.float32))

    o0 = tx.init(params)
    np.asarray(opt_loop(params, o0, grads))
    t = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(opt_loop(params, o0, grads))
        t.append((time.perf_counter() - t0) / k * 1e3)
    return bb_fwd_ms, bb_fwd_flops, min(t)


def run_freeze_sweep(variants, args):
    """Interleaved timing of the full train step at FREEZE_AT=0..5.

    freeze_at=k−1 minus freeze_at=k is the in-situ marginal cost of
    training stage k (its backward + its train-mode BN), measured inside
    the real step — the number a layout/dtype lever on that stage can
    actually recover.
    """
    print("== preparing freeze-sweep variants ==", flush=True)
    prepped = {}
    for name, opts in variants:
        prepped[name] = _prep_variant(opts, args.steps)
        print(f"  compiled {name}", flush=True)
    times = {name: [] for name, _ in variants}
    for trial in range(args.trials):
        for name, _ in variants:
            times[name].append(_time_variant(prepped[name], args.steps))
        print(
            f"  trial {trial}: "
            + "  ".join(f"{n}={times[n][-1]:.1f}ms" for n, _ in variants),
            flush=True,
        )
    med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
    flops = {n: prepped[n]["flops"] for n, _ in variants}
    stage_names = ["stem", "res2", "res3", "res4", "res5"]
    rows = []
    print("\n== in-situ backbone-stage marginal train cost ==")
    for k in range(6):
        name = f"freeze_at={k}"
        r = {"variant": name, "ms": round(med[name], 2),
             "gflops": round((flops[name] or 0) / 1e9, 1)}
        if k > 0:
            prev = f"freeze_at={k - 1}"
            dms = med[prev] - med[name]
            dfl = (flops[prev] - flops[name]) if (flops[prev] and flops[name]) else None
            mfu = (
                dfl / (dms / 1e3) / V5E_PEAK_FLOPS
                if (dfl and dms > 0 and jax.default_backend() != "cpu")
                else None
            )
            r["stage"] = stage_names[k - 1]
            r["delta_ms"] = round(dms, 2)
            r["delta_gflops"] = round(dfl / 1e9, 1) if dfl else None
            r["delta_mfu"] = round(mfu, 4) if mfu else None
            print(
                f"{name:12s} {r['ms']:8.2f} ms   Δ({stage_names[k-1]:5s}) "
                f"{dms:7.2f} ms  {r['delta_gflops'] or 0:8.1f} GFLOP  "
                f"MFU {100 * (mfu or 0):5.1f}%",
                flush=True,
            )
        else:
            print(f"{name:12s} {r['ms']:8.2f} ms", flush=True)
        rows.append(r)
    print(json.dumps({"freeze_sweep": rows}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--extra-opts", nargs="*", default=[])
    ap.add_argument(
        "--ab", default=None, metavar="OPTS",
        help='generic interleaved A/B of the full train step: base config '
        'vs base + these opts (e.g. --ab "TPU.STEM_BACKEND s2d")',
    )
    ap.add_argument(
        "--freeze-sweep", action="store_true",
        help="sweep MODEL.BACKBONE.FREEZE_AT 0..5 instead of the branch "
        "knockouts: successive deltas localize the in-situ backbone "
        "backward per stage (caveat: freezing also switches those stages "
        "to FrozenBN + the plain-conv stem, so each delta = bwd removal "
        "+ BN-stat removal for that stage)",
    )
    args = ap.parse_args()

    if args.ab:
        variants = [
            ("base", list(args.extra_opts)),
            (args.ab, list(args.extra_opts) + args.ab.split()),
        ]
        print("== preparing A/B variants ==", flush=True)
        prepped = {n: _prep_variant(o, args.steps) for n, o in variants}
        for n in prepped:
            print(f"  compiled {n}", flush=True)
        times = {n: [] for n, _ in variants}
        for trial in range(args.trials):
            for n, _ in variants:
                times[n].append(_time_variant(prepped[n], args.steps))
            print(
                f"  trial {trial}: "
                + "  ".join(f"{n}={times[n][-1]:.2f}ms" for n, _ in variants),
                flush=True,
            )
        med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
        print(json.dumps({"ab": {n: round(v, 2) for n, v in med.items()},
                          "delta_ms": round(med[args.ab] - med["base"], 2)}))
        return

    if args.freeze_sweep:
        variants = [
            (f"freeze_at={k}", list(args.extra_opts)
             + ["MODEL.BACKBONE.FREEZE_AT", str(k)])
            for k in range(6)
        ]
        run_freeze_sweep(variants, args)
        return

    variants = [
        (name, list(args.extra_opts) + opt) for name, opt in VARIANTS
    ]
    print("== preparing variants (compile all first, then interleave) ==", flush=True)
    prepped = {}
    for name, opts in variants:
        prepped[name] = _prep_variant(opts, args.steps)
        print(f"  compiled {name}", flush=True)

    times = {name: [] for name, _ in variants}
    for trial in range(args.trials):
        for name, _ in variants:
            times[name].append(_time_variant(prepped[name], args.steps))
        print(
            f"  trial {trial}: "
            + "  ".join(f"{n}={times[n][-1]:.1f}ms" for n, _ in variants),
            flush=True,
        )
    med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
    flops = {n: prepped[n]["flops"] for n, _ in variants}

    bb_fwd_ms, bb_fwd_flops, opt_ms = standalone_stages(
        prepped["full"]["built"], args.trials
    )

    full_ms, full_fl = med["full"], flops["full"]
    rows = []

    def row(stage, ms, fl):
        mfu = (
            fl / (ms / 1e3) / V5E_PEAK_FLOPS
            if (fl and ms > 0 and jax.default_backend() != "cpu")
            else None
        )
        rows.append(
            {
                "stage": stage,
                "ms": round(ms, 2),
                "gflops": round(fl / 1e9, 1) if fl else None,
                "mfu": round(mfu, 4) if mfu else None,
            }
        )

    row("full_step", full_ms, full_fl)
    for name, _ in variants[1:]:
        dms = full_ms - med[name]
        dfl = (full_fl - flops[name]) if (full_fl and flops[name]) else None
        row(f"Δ {name}", dms, dfl)
    row("backbone_fwd(standalone)", bb_fwd_ms, bb_fwd_flops)
    # ResNet bwd = freeze-delta; its flops = Δflops of the freeze knockout
    frz = "no_resnet_bwd(FREEZE_AT=5)"
    row(
        "resnet_bwd(=freeze Δ)",
        full_ms - med[frz],
        (full_fl - flops[frz]) if (full_fl and flops[frz]) else None,
    )
    row("sgd_update(standalone)", opt_ms, None)
    rest = (
        med[frz]
        - bb_fwd_ms
        - opt_ms
        - (full_ms - med["no_mask_branch"])
        - (full_ms - med["no_recognizer_branch"])
    )
    row("rpn+matcher+box+sampling(remainder)", rest, None)

    print("\n== train step stage table (b=1, 1024x1024, G=24) ==")
    for r in rows:
        g = f"{r['gflops']:9.1f}" if r["gflops"] is not None else "        -"
        m = f"{100 * r['mfu']:5.1f}%" if r["mfu"] is not None else "     -"
        print(f"{r['stage']:38s} {r['ms']:8.2f} ms  {g} GFLOP  MFU {m}")
    print(json.dumps({"train_mfu_table": rows, "medians_ms": {k: round(v, 2) for k, v in med.items()}}))


if __name__ == "__main__":
    main()
