#!/usr/bin/env python
"""GLASS-TPU evaluation CLI.

Mirrors reference ``tools/eval_glass.py``: loads a model + config, applies
the eval-time overrides the reference hardwires (``eval_glass.py:82-114`` —
NMS 0.35, text-score 0.3, det-score 0.65, min-size 1000, mask inference on,
orientation-overwrite off), runs inference over the test datasets and
reports E2E + detection-only precision/recall/hmean under the official RRC
protocol.
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logger = logging.getLogger("eval_glass")


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate the GLASS-TPU text spotter")
    p.add_argument("--model", required=False, default=None, help=".pth/orbax checkpoint")
    p.add_argument("--config", required=True, help="model config yaml")
    p.add_argument("--datasets", default=None, help="dataset config yaml")
    p.add_argument("--output", default="./eval_output")
    p.add_argument("--gt-zip", default=None, help="RRC gt zip (else gt from dataset json)")
    p.add_argument("--word-spotting", action="store_true")
    p.add_argument("--lexicon", default=None, help="ad-hoc lexicon txt file")
    p.add_argument("--weighted-ed", action="store_true")
    # Benchmark lexicon protocol (reference cfg.TEST.LEXICON_TYPE):
    p.add_argument("--lexicon-type", type=int, default=None,
                   help="0 none / 1 generic / 2 weak / 3 per-image strong")
    p.add_argument("--lexicon-path", default=None, help="types 1/2 lexicon txt")
    p.add_argument("--lexicon-pairs", default=None, help="types 1/2 pairs txt")
    p.add_argument("--strong-lexicon-dir", default=None,
                   help="type 3: dir of new_voc_img_<i>.txt / pair_voc_img_<i>.txt")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation (TEST.AUG multi-scale+flip; "
                        "reference Trainer.test_with_TTA)")
    p.add_argument("--params", action="store_true",
                   help="print the per-module parameter census "
                        "(reference eval_glass.py:147-181)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--bench-log", default=None,
                   help="write per-batch JSONL timing/RSS records here "
                        "(tools/sustained_eval.py consumes them)")
    p.add_argument("--batch-size", type=int, default=1,
                   help=">1 runs batched (vmapped) inference per bucket")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def setup(args):
    from glass_tpu.config import get_cfg, merge_from_dataset_config
    from glass_tpu.utils.logger import setup_logger

    cfg = get_cfg(args.config)
    if args.datasets:
        merge_from_dataset_config(cfg, args.datasets)
    # Reference eval-time overrides (tools/eval_glass.py:82-114).  NOTE:
    # the reference merges ``args.opts`` AFTER this hardwired block
    # (eval_glass.py:117), so explicit CLI opts WIN over the protocol
    # defaults — e.g. a small-resolution eval can set INPUT.MIN_SIZE_TEST.
    # (Round-5 regression fix: opts were previously merged first and
    # silently lost to these overrides.)
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.35
    cfg.INFERENCE_TH_TEST = 0.3
    cfg.INFERENCE_DETECTION_TH_TEST = 0.65
    cfg.POST_PROCESSING.TEXT_THRESHOLD = 0.3
    cfg.POST_PROCESSING.DETECT_THRESHOLD = 0.65
    cfg.INPUT.MIN_SIZE_TEST = 1000
    cfg.INPUT.MAX_SIZE_TEST = 1600
    cfg.MODEL.ROI_MASK_HEAD.MASK_INFERENCE = True
    cfg.MODEL.ROI_ORIENTATION_HEAD.APPLY_TO_BOXES = False
    if args.opts:
        cfg.merge_from_list(args.opts)
    # Lexicon protocol flags -> config keys (reference eval_glass.py:101-104).
    if args.lexicon_type is not None:
        cfg.TEST.LEXICON_TYPE = args.lexicon_type
    if args.lexicon_path:
        cfg.TEST.LEXICON_PATH = args.lexicon_path
    if args.lexicon_pairs:
        cfg.TEST.LEXICON_PAIRS_PATH = args.lexicon_pairs
    if args.strong_lexicon_dir:
        cfg.TEST.STRONG_LEXICON_DIR = args.strong_lexicon_dir
    if args.weighted_ed:
        cfg.TEST.LEXICON_WEIGHTED = True
    if args.weighted_ed or cfg.TEST.LEXICON_WEIGHTED:
        # Weighted edit distance consumes the full per-step character
        # distributions — keep them on the host fetch path.
        cfg.TPU.TEXT_EMIT = "probs"
    if args.word_spotting:
        cfg.IS_WORD_SPOTTING = True
    setup_logger(output=args.output)
    return cfg


def main():
    args = parse_args()
    cfg = setup(args)

    from glass_tpu.data import DatasetManager, DatasetMapper
    from glass_tpu.evaluation import Lexicon, TextEvaluator
    from glass_tpu.inference import GlassRunner

    runner = GlassRunner(model_path=args.model, cfg=cfg)
    if args.params:
        from glass_tpu.utils.common import format_parameter_census, parameter_census

        print(format_parameter_census(parameter_census(runner.params), per_param=True))
    tta_runner = None
    if args.tta or cfg.TEST.AUG.ENABLED:
        from glass_tpu.inference.tta import GlassRunnerWithTTA

        logger.info("Running inference with test-time augmentation ...")
        tta_runner = GlassRunnerWithTTA(runner)
    lexicon = None
    if args.lexicon:
        lexicon = Lexicon.from_file(args.lexicon, weighted=args.weighted_ed)

    DatasetManager(cfg).register()
    all_results = {}
    for dataset_name in cfg.DATASETS.TEST:
        records = DatasetManager.load(dataset_name)
        if args.max_images:
            records = records[: args.max_images]
        # multi-host: strided shard per process; TextEvaluator.evaluate()
        # allgathers results so every host reports identical metrics
        import jax

        if jax.process_count() > 1:
            records = records[jax.process_index() :: jax.process_count()]
        gt_zip = args.gt_zip
        if not gt_zip:
            # Configured gt archives (DATASETS.EVAL_GT_ZIPS.*) by name match.
            for key, path in cfg.DATASETS.EVAL_GT_ZIPS.items():
                if path and key.lower() in dataset_name.lower():
                    gt_zip = path
                    break
        evaluator = TextEvaluator(
            dataset_name,
            cfg,
            output_dir=args.output,
            gt_zip=gt_zip,
            word_spotting=True if args.word_spotting else None,
            lexicon=lexicon,
        )
        t0 = time.time()
        import cv2

        chunk = max(args.batch_size, 1)
        for start in range(0, len(records), chunk):
            batch_records, batch_images = [], []
            for record in records[start : start + chunk]:
                image = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
                if image is None:
                    logger.warning("unreadable: %s", record["file_name"])
                    continue
                batch_records.append(record)
                batch_images.append(image)
            if not batch_images:
                continue
            if tta_runner is not None:
                preds_list = [tta_runner.eval_call(im) for im in batch_images]
            elif chunk == 1:
                preds_list = [runner.eval_call(batch_images[0])]
            else:
                preds_list = runner.eval_batch_call(batch_images, batch_size=chunk)
            for record, preds in zip(batch_records, preds_list):
                key = str(record.get("image_id", start))
                evaluator.process(key, preds, gt_record=record)
            done = min(start + chunk, len(records))
            if args.bench_log:
                import resource

                with open(args.bench_log, "a") as bf:
                    bf.write(json.dumps({
                        "dataset": dataset_name,
                        "done": done,
                        "elapsed_s": round(time.time() - t0, 4),
                        "rss_mb": round(
                            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
                        ),
                    }) + "\n")
            if done % 50 < chunk:
                rate = done / (time.time() - t0)
                logger.info("%s: %d/%d images (%.2f img/s)", dataset_name, done, len(records), rate)
        results = evaluator.evaluate()
        all_results[dataset_name] = results
        logger.info("%s results: %s", dataset_name, json.dumps(results, indent=2))

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump(all_results, f, indent=2)
    print(json.dumps(all_results, indent=2))


if __name__ == "__main__":
    main()
