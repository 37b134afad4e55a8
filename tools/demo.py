#!/usr/bin/env python
"""Single-image demo: the reference ``demo/glass_demo.ipynb`` flow as a CLI.

Loads a checkpoint + config, spots text in one image, prints the words and
writes a visualization (reference ``glass/utils/visualizer.py`` equivalent,
rendered with matplotlib instead of plotly).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--model", default=None)
    p.add_argument("--output", default="demo_out.png")
    p.add_argument("--no-post-process", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from glass_tpu.config import get_cfg
    from glass_tpu.inference import GlassRunner
    from glass_tpu.utils.visualizer import visualize

    cfg = get_cfg(args.config, args.opts)
    runner = GlassRunner(
        model_path=args.model, cfg=cfg, post_process=not args.no_post_process
    )
    image = cv2.imread(args.image, cv2.IMREAD_COLOR)
    preds = runner(image)
    texts, scores, char_scores = (
        runner.decode_texts(preds) if len(preds) else ([], [], [])
    )

    print(f"{len(preds)} words:")
    for t, s, box in zip(texts, scores, np.asarray(preds.pred_boxes) if len(preds) else []):
        print(f"  {t!r}  score={s:.3f}  box={np.round(box, 1).tolist()}")

    if args.output.endswith(".html"):
        # Interactive hover figure (the reference's plotly notebook output,
        # as a self-contained HTML file).
        from glass_tpu.utils.visualizer import visualize_html

        visualize_html(
            image[:, :, ::-1], preds, texts,
            text_scores=scores, char_scores=char_scores,
            save_path=args.output, title=os.path.basename(args.image),
        )
    else:
        visualize(image[:, :, ::-1], preds, texts, scores, save_path=args.output)
    print(f"visualization written to {args.output}")


if __name__ == "__main__":
    main()
