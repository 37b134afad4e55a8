#!/usr/bin/env python
"""Convert a released detectron2 ``.pth`` GLASS checkpoint to Orbax.

Usage:
    python tools/convert_checkpoint.py --input glass_icdar15.pth \
        --output ckpt_dir [--config configs/glass_finetune_icdar15.yaml]

With --config, the converted tree is structurally validated against the
randomly-initialized parameter tree for that architecture (every leaf must
match in path and shape) before saving.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--config", default=None)
    args = p.parse_args()

    from glass_tpu.train.checkpoint import load_torch_checkpoint, save_checkpoint
    from glass_tpu.utils.common import flatten_dict

    tree = load_torch_checkpoint(args.input)
    flat = flatten_dict(tree)
    print(f"converted {len(flat)} tensors from {args.input}")

    if args.config:
        import jax

        from glass_tpu.config import get_cfg
        from glass_tpu.models import GlassArch, init_glass_params

        cfg = get_cfg(args.config)
        arch = GlassArch.from_config(cfg)
        expect = flatten_dict(init_glass_params(jax.random.PRNGKey(0), arch))
        missing = sorted(set(expect) - set(flat))
        extra = sorted(set(flat) - set(expect))
        mismatched = [
            k for k in set(expect) & set(flat)
            if tuple(np.shape(flat[k])) != tuple(np.shape(expect[k]))
        ]
        if missing:
            print(f"MISSING {len(missing)} leaves, e.g. {missing[:8]}")
        if extra:
            print(f"EXTRA {len(extra)} leaves, e.g. {extra[:8]}")
        if mismatched:
            print(f"SHAPE MISMATCH on {len(mismatched)}, e.g. {mismatched[:8]}")
        if not (missing or mismatched):
            print("structural validation OK")

    os.makedirs(args.output, exist_ok=True)
    path = save_checkpoint(args.output, 0, tree)
    print(f"saved Orbax checkpoint at {path}")


if __name__ == "__main__":
    main()
