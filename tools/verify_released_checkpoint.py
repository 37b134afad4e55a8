#!/usr/bin/env python
"""One-command released-checkpoint verification (VERDICT r2 #1c).

The north-star correctness claim — load the reference's released ``.pth`` +
YAML and reproduce its hmean within 0.5 pts (BASELINE.md targets) — cannot
be executed in the build environment (no network).  This script makes the
verification a single command for the day network (and the benchmark
datasets) exist:

    python tools/verify_released_checkpoint.py --model icdar15 \
        --dataset-root /data/icdar15 --datasets data_configs/icdar15.yaml \
        --expected-hmean 0.847 --tolerance 0.005 --output /tmp/verify

Steps: download the released checkpoint + config (reference README.md:72-74
URLs), convert the torch state dict to this framework's parameter tree
(``glass_tpu/train/checkpoint.py``), run the official eval protocol via
``tools/eval_glass.py``, and diff the resulting hmean against the expected
value.  ``--checkpoint/--config`` accept local paths to skip the download
(artifacts fetched once work offline).  ``--dry-run`` validates the full
convert->eval->report plumbing against a locally generated checkpoint and
synthetic dataset — exercised by ``tests/test_verify_released.py``.
"""

import argparse
import json
import os
import runpy
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Released artifacts (reference README.md:72-74).
RELEASED = {
    "icdar15": {
        "checkpoint": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/models/glass_250k_icdar15_fintune.pth",
        "config": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/configs/glass_config_icdar15.yaml",
    },
    "totaltext": {
        "checkpoint": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/models/glass_250k_totaltext_finetune.pth",
        "config": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/configs/glass_config_totaltext.yaml",
    },
    "textocr": {
        "checkpoint": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/models/glass_250k_full_textocr_finetune.pth",
        "config": "https://glass-text-spotting.s3.eu-west-1.amazonaws.com/configs/glass_config_textocr.yaml",
    },
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", choices=sorted(RELEASED),
                   help="released model to verify (resolves the S3 URLs)")
    p.add_argument("--checkpoint", default=None,
                   help="local .pth path (skips the checkpoint download)")
    p.add_argument("--config", default=None,
                   help="local model yaml (skips the config download)")
    p.add_argument("--datasets", default=None, help="dataset config yaml")
    p.add_argument("--dataset-root", default=None,
                   help="override DATASETS.ROOT")
    p.add_argument("--gt-zip", default=None, help="official RRC gt zip")
    p.add_argument("--cache-dir", default=os.path.expanduser(
        "~/.cache/glass_tpu/released"))
    p.add_argument("--output", default="./verify_output")
    p.add_argument("--expected-hmean", type=float, default=None,
                   help="reference E2E hmean to diff against (fractional); "
                        "omit to just record the measured value")
    p.add_argument("--tolerance", type=float, default=0.005,
                   help="max |measured - expected| (BASELINE.md: 0.5 pts)")
    p.add_argument("--word-spotting", action="store_true")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--dry-run", action="store_true",
                   help="no network: verify plumbing on local artifacts")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args(argv)


def _download(url: str, dest: str) -> str:
    if os.path.exists(dest) and os.path.getsize(dest) > 0:
        print(f"[verify] cached: {dest}")
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print(f"[verify] downloading {url} -> {dest}")
    import urllib.request

    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)
    return dest


def resolve_artifacts(args):
    """Return (checkpoint_path, config_path), downloading if needed."""
    ckpt, cfg = args.checkpoint, args.config
    if args.model and (ckpt is None or cfg is None):
        urls = RELEASED[args.model]
        if ckpt is None:
            ckpt = _download(
                urls["checkpoint"],
                os.path.join(args.cache_dir, os.path.basename(urls["checkpoint"])),
            )
        if cfg is None:
            cfg = _download(
                urls["config"],
                os.path.join(args.cache_dir, os.path.basename(urls["config"])),
            )
    if ckpt is None or cfg is None:
        raise SystemExit(
            "need --model (to download) or both --checkpoint and --config"
        )
    return ckpt, cfg


def run_eval(args, ckpt: str, cfg_path: str) -> dict:
    """Drive tools/eval_glass.py in-process and return its results dict."""
    argv = [
        os.path.join(os.path.dirname(__file__), "eval_glass.py"),
        "--model", ckpt,
        "--config", cfg_path,
        "--output", args.output,
    ]
    if args.datasets:
        argv += ["--datasets", args.datasets]
    if args.gt_zip:
        argv += ["--gt-zip", args.gt_zip]
    if args.word_spotting:
        argv += ["--word-spotting"]
    if args.max_images:
        argv += ["--max-images", str(args.max_images)]
    if args.batch_size != 1:
        argv += ["--batch-size", str(args.batch_size)]
    opts = list(args.opts)
    if args.dataset_root:
        opts += ["DATASETS.ROOT", args.dataset_root]
    argv += opts
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(argv[0], run_name="__main__")
    finally:
        sys.argv = old_argv
    with open(os.path.join(args.output, "results.json")) as f:
        return json.load(f)


def extract_hmean(results: dict) -> float:
    """E2E hmean of the first dataset (``evaluate_dataset`` layout:
    {dataset: {"E2E_RESULTS": {precision, recall, hmean}, ...}})."""
    for _, metrics in results.items():
        e2e = metrics.get("E2E_RESULTS")
        if isinstance(e2e, dict) and "hmean" in e2e:
            return float(e2e["hmean"])
    raise KeyError(f"no hmean in results: {json.dumps(results)[:400]}")


def main(argv=None) -> int:
    args = parse_args(argv)
    os.makedirs(args.output, exist_ok=True)

    ckpt, cfg_path = resolve_artifacts(args)

    # Conversion sanity before the (long) eval: the torch state dict must
    # map onto the parameter tree with full coverage.
    from glass_tpu.train.checkpoint import load_any_checkpoint

    tree = load_any_checkpoint(ckpt)
    n_leaves = len(
        [1 for _ in __import__("jax").tree_util.tree_leaves(tree)]
    )
    print(f"[verify] converted checkpoint: {n_leaves} parameter leaves")
    if n_leaves < (5 if args.dry_run else 100):
        raise SystemExit(f"conversion produced only {n_leaves} leaves")

    results = run_eval(args, ckpt, cfg_path)
    measured = extract_hmean(results)

    report = {
        "checkpoint": ckpt,
        "config": cfg_path,
        "measured_hmean": measured,
        "expected_hmean": args.expected_hmean,
        "tolerance": args.tolerance,
        "results": results,
    }
    ok = True
    if args.expected_hmean is not None:
        diff = abs(measured - args.expected_hmean)
        report["diff"] = diff
        ok = diff <= args.tolerance
        print(
            f"[verify] hmean measured={measured:.4f} "
            f"expected={args.expected_hmean:.4f} diff={diff:.4f} "
            f"tolerance={args.tolerance:.4f} -> {'PASS' if ok else 'FAIL'}"
        )
    else:
        print(f"[verify] hmean measured={measured:.4f} (no expected value "
              "given — record it in BASELINE.md)")
    report["pass"] = ok
    with open(os.path.join(args.output, "verification_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
