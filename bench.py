"""End-to-end spotting throughput benchmark (single chip).

Runs the full jitted image -> words pipeline (ResNet50+FPN, rotated RPN,
box+orientation head, rotated NMS, global/local fusion, recognizer decode)
on the ICDAR15 eval configuration at 1280x736, and reports images/sec.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
therefore reported as null until a reference-GPU measurement exists.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np


def _run():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch, glass_inference_single, init_glass_params

    cfg = get_cfg(
        os.path.join(os.path.dirname(__file__), "configs", "glass_finetune_icdar15.yaml")
    )
    # Reference eval-time overrides (tools/eval_glass.py:83-98).
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    arch = GlassArch.from_config(cfg)
    params = init_glass_params(jax.random.PRNGKey(0), arch)

    h, w = 736, 1280  # ICDAR15 720x1280 frames, shortest edge padded to /32
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(h, w, 3).astype(np.float32) * 255)
    content_hw = jnp.asarray([720, 1280], np.int32)

    fn = jax.jit(lambda p, im, hw: glass_inference_single(arch, p, im, hw))

    def fetch(out):
        # block_until_ready does not reliably block on tunneled backends;
        # materializing an output is the only true barrier.
        return jax.tree_util.tree_map(np.asarray, out)

    fetch(fn(params, image, content_hw))  # warmup / compile

    # Steady-state throughput: dispatch the whole window asynchronously and
    # materialize only the final output (same-stream ordering makes the last
    # fetch a barrier for all prior steps).  Per-call host fetches would
    # measure the tunnel (~30 ms/fetch), not the chip.
    n_iters = 20
    start = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = fn(params, image, content_hw)
    fetch(out)
    elapsed = time.perf_counter() - start
    return n_iters / elapsed


def main():
    try:
        ips = _run()
        result = {
            "metric": "e2e_spotting_images_per_sec_single_chip",
            "value": round(ips, 3),
            "unit": "images/sec",
            "vs_baseline": None,
        }
    except Exception as e:  # never leave the driver without a record
        import traceback

        traceback.print_exc(file=sys.stderr)
        result = {
            "metric": "e2e_spotting_images_per_sec_single_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:200],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
