"""Sustained-eval throughput proof — the TextOCR-scale workload analog.

BASELINE.md lists a ~25k-image eval as a reference workload; nothing in
the fast tier exercises the eval loop beyond a 20-frame window. This tool
drives the REAL eval CLI (``tools/eval_glass.py``) over a >=200-image
synthetic dataset at realistic resolution and reports:

* steady-state img/s (after the compile-warmup batches),
* first-50 vs last-50 image rate drift — the leak / compile-churn
  tripwire (every image shares one resize bucket, so any drift is
  runtime state, not recompiles),
* peak host RSS.

Reference anchor: ``/root/reference/tools/eval_glass.py:183-186``
(``Trainer.test`` over a full dataset).

Usage: python tools/sustained_eval.py [--images 200] [--batch 4]
Prints one JSON dict.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root: str, name: str, n: int, h=720, w=1280, words_per_img=8):
    """COCO-style synthetic set: noise images + axis-aligned word boxes."""
    import cv2

    os.makedirs(f"{root}/{name}", exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for _ in range(words_per_img):
            bw, bh = rng.randint(60, 200), rng.randint(20, 50)
            x0 = rng.randint(0, w - bw)
            y0 = rng.randint(0, h - bh)
            img[y0 : y0 + bh, x0 : x0 + bw] = rng.randint(0, 40)
            quad = [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh], [x0, y0 + bh]]
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": 1,
                "bbox": [x0, y0, bw, bh], "rotated_box": quad,
                "segmentation": [[c for pt in quad for c in pt]],
                "rec": "word", "angle": 0, "orientation": 0,
                "area": bw * bh, "iscrowd": 0,
            })
            aid += 1
        cv2.imwrite(f"{root}/{name}/img_{i:04d}.jpg", img)
        images.append({
            "id": i + 1, "file_name": f"img_{i:04d}.jpg", "height": h, "width": w
        })
    with open(f"{root}/{name}/annotations.json", "w") as f:
        json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "word"}],
        }, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    base = tempfile.mkdtemp(prefix="sustained_eval_")
    root = os.path.join(base, "ds")
    make_dataset(root, "sustained", args.images)
    ds_yaml = os.path.join(base, "datasets.yaml")
    with open(ds_yaml, "w") as f:
        f.write(f"ROOT: {root}\nDATASETS: []\nVAL_DATASETS:\n  - sustained\n")
    bench_log = os.path.join(base, "bench.jsonl")
    out_dir = os.path.join(base, "out")

    cfg_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "configs",
        "glass_finetune_icdar15.yaml",
    )
    sys.argv = [
        "eval_glass.py",
        "--config", cfg_path,
        "--datasets", ds_yaml,
        "--output", out_dir,
        "--batch-size", str(args.batch),
        "--bench-log", bench_log,
        # keep every detection slot occupied (random weights): worst-case
        # recognizer/mask/post-process load, same rationale as bench.py
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.0",
        "POST_PROCESSING.TEXT_THRESHOLD", "0.0",
        "POST_PROCESSING.DETECT_THRESHOLD", "0.0",
        "POST_PROCESSING.VALID_CONFIDENCE", "0.0",
    ]
    import eval_glass

    eval_glass.main()

    rows = [json.loads(l) for l in open(bench_log)]
    res = {"images": args.images, "batch": args.batch}
    # steady state: drop the first 3 batches (compile + cache warm)
    warm = rows[3:]
    if warm:
        d0, t0 = warm[0]["done"], warm[0]["elapsed_s"]
        dN, tN = warm[-1]["done"], warm[-1]["elapsed_s"]
        res["steady_state_ips"] = round((dN - d0) / (tN - t0), 3)
    # first-50 vs last-50 drift
    def window_rate(lo, hi):
        sel = [r for r in rows if lo <= r["done"] <= hi]
        if len(sel) < 2:
            return None
        return round(
            (sel[-1]["done"] - sel[0]["done"])
            / (sel[-1]["elapsed_s"] - sel[0]["elapsed_s"]),
            3,
        )

    n = rows[-1]["done"]
    res["first50_ips"] = window_rate(args.batch, 50)
    res["last50_ips"] = window_rate(n - 50, n)
    if res.get("first50_ips") and res.get("last50_ips"):
        res["rate_drift_pct"] = round(
            100 * (res["last50_ips"] - res["first50_ips"]) / res["first50_ips"], 1
        )
    res["peak_rss_mb"] = max(r["rss_mb"] for r in rows)
    res["rss_growth_mb"] = round(rows[-1]["rss_mb"] - rows[min(3, len(rows) - 1)]["rss_mb"], 1)
    res["total_s"] = rows[-1]["elapsed_s"]
    res["host_loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(res, indent=1))
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
