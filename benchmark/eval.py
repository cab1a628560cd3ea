"""Benchmark evaluation CLI — rebuild of /root/reference/benchmark/eval.py.

File-based: reads a pred.json (benchmark/predict.py format) and a GT bbox
json (scripts/build_benchmark_gt.py format), prints caption P/R/F1 @ IoU
{0, 0.25, 0.5}, detection mAP@0.25/0.5, and dense-caption mAP.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True, help="pred.json path")
    p.add_argument("--gt_path", type=str, required=True,
                   help="GT bbox json (build_benchmark_gt.py output)")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--no_caption", action="store_true")
    p.add_argument("--no_detection", action="store_true")
    p.add_argument("--no_densecap", action="store_true")
    p.add_argument("--verbose", action=argparse.BooleanOptionalAction,
                   default=True)  # --no-verbose turns it off (was a dead flag)
    p.add_argument("--rotated_boxes", action="store_true",
                   help="polygon-clip gIoU assignment for z-rotated boxes "
                        "(reference rotated_boxes=True path; ScanNet boxes "
                        "are axis-aligned so the default matches its eval)")
    return p.parse_args()


def main():
    args = parse_args()
    from scan2cap_tpu.eval.benchmark import evaluate

    with open(args.path) as f:
        predictions = json.load(f)
    with open(args.gt_path) as f:
        gt_json = json.load(f)

    results = evaluate(
        predictions, gt_json, verbose=args.verbose,
        caption=not args.no_caption,
        detection=not args.no_detection,
        densecap=not args.no_densecap,
        rotated_boxes=args.rotated_boxes)

    out_path = os.path.join(os.path.dirname(args.path), "eval_results.json")

    def _clean(o):
        if isinstance(o, dict):
            return {str(k): _clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [_clean(v) for v in o]
        if hasattr(o, "item"):
            return o.item()
        return o

    with open(out_path, "w") as f:
        json.dump(_clean(results), f, indent=2)
    print(f"results saved to {out_path}")


if __name__ == "__main__":
    main()
