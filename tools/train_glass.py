#!/usr/bin/env python
"""GLASS-TPU training CLI.

Mirrors the reference CLI surface (``tools/train_glass.py --datasets
--config --output --resume --opts``) with TPU-native execution: one process
drives all chips through the device mesh — no ``--num-gpus``/``launch()``
process spawning (multi-host runs initialize ``jax.distributed`` from the
environment instead).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train the GLASS-TPU text spotter")
    p.add_argument("--config", required=True, help="model config yaml")
    p.add_argument("--datasets", default=None, help="dataset config yaml")
    p.add_argument("--output", default="./output", help="output directory")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--weights", default=None, help="initial checkpoint (.pth or orbax)")
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--debug", action="store_true", help="tiny shapes, verbose")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed for multi-host meshes")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="KEY VALUE config overrides")
    return p.parse_args()


def setup(args):
    from glass_tpu.config import get_cfg, merge_from_dataset_config
    from glass_tpu.utils.logger import setup_logger

    cfg = get_cfg(args.config)
    if args.datasets:
        merge_from_dataset_config(cfg, args.datasets)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.OUTPUT_DIR = args.output
    if args.weights:
        cfg.MODEL.WEIGHTS = args.weights
    if args.debug:
        cfg.SOLVER.IMS_PER_BATCH = 1
        cfg.DATALOADER.NUM_WORKERS = 0
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger(output=cfg.OUTPUT_DIR)
    return cfg


def main():
    args = parse_args()
    if args.distributed:
        import jax

        jax.distributed.initialize()
    cfg = setup(args)

    from glass_tpu.train import Trainer

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    trainer.train(max_iter=args.max_iter)


if __name__ == "__main__":
    main()
