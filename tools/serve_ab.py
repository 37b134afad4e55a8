#!/usr/bin/env python
"""Model-only serve-frame A/B: time glass_inference_single at the bench
shape (736x1280 uint8) under config overrides, with backend provenance.

Usage: python tools/serve_ab.py [KEY VALUE ...]
e.g.   python tools/serve_ab.py TPU.CROP_BACKEND xla
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from glass_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from glass_tpu.config import get_cfg
    from glass_tpu.models import GlassArch, glass_inference_single, init_glass_params
    from glass_tpu.models.glass_rcnn import resolved_crop_backend

    cfg = get_cfg(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "glass_finetune_icdar15.yaml")
    )
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    cfg.MODEL.ROI_MASK_HEAD.MASK_INFERENCE = True
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    if sys.argv[1:]:
        cfg.merge_from_list(sys.argv[1:])

    arch = GlassArch.from_config(cfg)
    params = init_glass_params(jax.random.PRNGKey(0), arch)
    rng = np.random.RandomState(0)
    h, w = 736, 1280
    image = jnp.asarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    content_hw = jnp.asarray([720, 1280], np.int32)
    fn = jax.jit(lambda p, im, hw: glass_inference_single(arch, p, im, hw))

    def fetch(out):
        return jax.tree_util.tree_map(np.asarray, out)

    fetch(fn(params, image, content_hw))
    for trial in range(3):
        n = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(params, image, content_hw)
        fetch(out)
        dt = (time.perf_counter() - t0) / n
        print(
            f"trial {trial}: {dt*1e3:.2f} ms/frame ({1/dt:.2f} img/s)  "
            f"crop={resolved_crop_backend(arch, (h, w), False, True)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
