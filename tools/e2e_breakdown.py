"""Per-component decomposition of the product e2e serving number.

The driver headline (``bench.py`` ``e2e_device_resident_b4_ips``) has sat
~3x below the model-only rate for three rounds; this tool measures where
each millisecond of a b=4 eval round goes so the gap is attributable, not
asserted:

* ``device``   — the vmapped b=4 model program, chained-in-graph (one
  dispatch + one 4-byte fetch per window: pure device time).
* ``fetch``    — device->host transfer of the output tree after compute
  has finished (barriered on a 1-element slice of the output), plus the
  exact byte count of the fetched tree.
* ``host``     — unpack + detector_postprocess + academic post-processing
  on a pre-fetched numpy tree (no device involvement).
* ``pipelined``— the real e2e loop (bench.py methodology), to compare
  against max(device, fetch+host) (perfect 1-deep overlap) and
  device+fetch+host (no overlap).

Reference anchor: the CPU merge loop this pipeline replaces,
``/root/reference/glass/postprocess/post_processor_rotated_boxes.py:108-184``.

Usage:  python tools/e2e_breakdown.py [--rounds 8]
        GLASS_BENCH_OPTS="POST_PROCESSING.ON_DEVICE True" python tools/e2e_breakdown.py
Prints one JSON dict.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

V5E_PEAK_FLOPS = 197e12


def build(extra_opts=None):
    import jax

    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch, init_glass_params
    from glass_tpu.inference import GlassRunner
    from glass_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_cfg(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..",
            "configs",
            "glass_finetune_icdar15.yaml",
        )
    )
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    cfg.MODEL.ROI_MASK_HEAD.MASK_INFERENCE = True
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.POST_PROCESSING.TEXT_THRESHOLD = 0.0
    cfg.POST_PROCESSING.DETECT_THRESHOLD = 0.0
    cfg.POST_PROCESSING.VALID_CONFIDENCE = 0.0
    opts = (extra_opts or os.environ.get("GLASS_BENCH_OPTS", "")).split()
    if opts:
        cfg.merge_from_list(opts)

    arch = GlassArch.from_config(cfg)
    import jax as _jax

    params = init_glass_params(_jax.random.PRNGKey(0), arch)
    runner = GlassRunner(model_path=None, cfg=cfg, params=params)
    return cfg, arch, params, runner


def staged_batch(runner, b=4):
    """The bench.py device-resident staging: resized+padded uint8 batch."""
    import cv2
    import jax.numpy as jnp

    from glass_tpu.data.mapper import shortest_edge_size

    rng = np.random.RandomState(0)
    images = [(rng.rand(720, 1280, 3) * 255).astype(np.uint8) for _ in range(b)]
    resized = []
    for img in images:
        bgr = img[:, :, ::-1]
        oh, ow = bgr.shape[:2]
        nh, nw = shortest_edge_size(
            oh, ow, runner.min_target_size, runner.max_target_size
        )
        resized.append(cv2.resize(bgr, (nw, nh)))
    bh, bw = runner._pick_bucket(*resized[0].shape[:2])
    padded = np.zeros((b, bh, bw, 3), np.uint8)
    hws = np.zeros((b, 2), np.int32)
    for i, im in enumerate(resized):
        padded[i, : im.shape[0], : im.shape[1]] = im
        hws[i] = im.shape[:2]
    return jnp.asarray(padded), jnp.asarray(hws), hws


def measure(rounds=8, b=4):
    import jax
    import jax.numpy as jnp

    cfg, arch, params, runner = build()
    device_batch, hws_d, hws = staged_batch(runner, b)

    # PRODUCT batched program (runner.batch_model_fn — lax.map of the
    # single-image program per TPU.SERVE_BATCH_MODE), same as bench.py.
    bh, bw = device_batch.shape[1:3]
    batch_fn = runner.batch_model_fn((b, bh, bw, device_batch.dtype.str))

    print("compiling b=4 batch program...", file=sys.stderr, flush=True)
    out = batch_fn(params, device_batch, hws_d)  # compile + warm
    jax.device_get(out)

    res = {"b": b, "rounds": rounds}

    # ---- device: chained-in-graph b=4 frames ------------------------------
    def _scalarize(o):
        s = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(o):
            s = s + jnp.sum(x[..., :1].astype(jnp.float32))
        return s

    k = 6

    @jax.jit
    def chained(p, im, hw_):
        def body(i, acc):
            o = batch_fn(p, im ^ jnp.uint8(i), hw_)
            return acc + _scalarize(o)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    print("compiling chained b=4 frames...", file=sys.stderr, flush=True)
    np.asarray(chained(params, device_batch, hws_d))  # compile
    print("timing device...", file=sys.stderr, flush=True)
    dev = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(params, device_batch, hws_d))
        dev.append((time.perf_counter() - t0) / k)
    device_round_ms = min(dev) * 1e3
    res["device_ms_per_round"] = round(device_round_ms, 2)
    res["device_ms_per_img"] = round(device_round_ms / b, 2)
    res["model_only_b4_ips"] = round(b / (device_round_ms / 1e3), 2)

    try:
        analysis = batch_fn.lower(params, device_batch, hws_d).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
        # lax.map counts the body once in cost analysis (bench.py:306-310).
        if str(cfg.TPU.SERVE_BATCH_MODE) == "map":
            flops *= b
        res["serve_flops_b4"] = flops
        if jax.default_backend() != "cpu":
            res["serve_model_mfu_b4"] = round(
                flops / (device_round_ms / 1e3) / V5E_PEAK_FLOPS, 4
            )
    except Exception:
        pass

    # ---- fetch: transfer time + bytes of the finished output tree ---------
    print("timing fetch...", file=sys.stderr, flush=True)
    fetch_ms, fetch_bytes = [], 0
    for _ in range(max(3, rounds // 2)):
        o = batch_fn(params, device_batch, hws_d)
        # barrier: a 1-element dependent slice forces compute completion
        # without moving the big tree (block_until_ready does not block on
        # tunneled backends)
        np.asarray(o["scores"][0, :1])
        t0 = time.perf_counter()
        o_np = jax.device_get(o)
        fetch_ms.append((time.perf_counter() - t0) * 1e3)
    fetch_bytes = int(
        sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(o_np))
    )
    res["fetch_ms_per_round"] = round(min(fetch_ms), 2)
    res["fetch_ms_per_img"] = round(min(fetch_ms) / b, 2)
    res["fetch_bytes_per_img"] = fetch_bytes // b
    res["fetch_mbps"] = round(fetch_bytes / 1e6 / (min(fetch_ms) / 1e3), 1)
    res["fetch_leaf_bytes"] = {
        jax.tree_util.keystr(p): int(np.asarray(x).nbytes // b)
        for p, x in jax.tree_util.tree_flatten_with_path(o_np)[0]
    }

    # ---- host: unpack + postprocess on a pre-fetched numpy tree -----------
    def postprocess(tree_np):
        insts = runner.collect_batch((tree_np, hws))
        outs = []
        for pr in insts:
            pr = runner._model_postprocess(pr, 720, 1280)
            outs.append(runner.post_processor(pr))
        return outs

    print("timing host postprocess...", file=sys.stderr, flush=True)
    postprocess(o_np)  # warm any lazy imports/jits in the host path
    host_ms = []
    for _ in range(max(3, rounds // 2)):
        t0 = time.perf_counter()
        postprocess(o_np)
        host_ms.append((time.perf_counter() - t0) * 1e3)
    res["host_ms_per_round"] = round(min(host_ms), 2)
    res["host_ms_per_img"] = round(min(host_ms) / b, 2)

    # ---- the real pipelined loop (bench.py methodology) -------------------
    def pipeline_round():
        t0 = time.perf_counter()
        inflight = batch_fn(params, device_batch, hws_d)
        for _ in range(rounds - 1):
            nxt = batch_fn(params, device_batch, hws_d)
            postprocess(jax.device_get(inflight))
            inflight = nxt
        postprocess(jax.device_get(inflight))
        return (time.perf_counter() - t0) / rounds * 1e3

    print("timing pipelined loop...", file=sys.stderr, flush=True)
    pipe = [pipeline_round() for _ in range(3)]
    pipelined_ms = min(pipe)
    res["pipelined_ms_per_round"] = round(pipelined_ms, 2)
    res["e2e_ips"] = round(b / (pipelined_ms / 1e3), 3)

    # ---- 3-stage pipeline (TPU.ASYNC_FETCH): fetch on a worker thread -----
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def pipeline_async_round(fpool):
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(rounds):
            d = batch_fn(params, device_batch, hws_d)
            pending.append(fpool.submit(jax.device_get, d))
            if len(pending) > 2:
                postprocess(pending.popleft().result())
        while pending:
            postprocess(pending.popleft().result())
        return (time.perf_counter() - t0) / rounds * 1e3

    print("timing async-fetch pipelined loop...", file=sys.stderr, flush=True)
    with ThreadPoolExecutor(1) as fpool:
        pipe_a = [pipeline_async_round(fpool) for _ in range(3)]
    res["pipelined_async_ms_per_round"] = round(min(pipe_a), 2)
    res["e2e_async_ips"] = round(b / (min(pipe_a) / 1e3), 3)

    # ---- attribution -------------------------------------------------------
    host_side = res["fetch_ms_per_round"] + res["host_ms_per_round"]
    res["perfect_overlap_ms"] = round(max(device_round_ms, host_side), 2)
    res["no_overlap_ms"] = round(device_round_ms + host_side, 2)
    res["overlap_efficiency"] = round(
        (res["no_overlap_ms"] - pipelined_ms)
        / max(res["no_overlap_ms"] - res["perfect_overlap_ms"], 1e-9),
        3,
    )
    # locally-attached projection: fetch at PCIe gen3 x16 (~10 GB/s)
    local_fetch_ms = fetch_bytes / 10e9 * 1e3
    res["projected_local_ips_per_chip"] = round(
        b / (max(device_round_ms, local_fetch_ms + res["host_ms_per_round"]) / 1e3), 2
    )
    res["backends"] = {
        "on_device_merge": bool(cfg.POST_PROCESSING.ON_DEVICE),
        "mask_fetch_dtype": cfg.TPU.MASK_FETCH_DTYPE,
        "text_emit": cfg.TPU.TEXT_EMIT,
        "postprocess_workers": int(cfg.TPU.POSTPROCESS_WORKERS),
    }
    res["host_loadavg_1m"] = round(os.getloadavg()[0], 2)
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    print(json.dumps(measure(args.rounds, args.batch), indent=1))
