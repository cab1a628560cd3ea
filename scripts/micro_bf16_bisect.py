"""bf16 train-quality bisection (VERDICT r2 item 3 / TPU_DESIGN §8).

The full-bf16 backbone wins 15% step time but collapses the 600-step
synthetic detection probe (mAP@0.25 0.380 -> 0.058).  This runner names
the culprit: it sweeps ``bf16_components`` subsets through
scripts/demo_synthetic_train.py (one subprocess per variant — the TPU
executes sequentially and the knob is config-level, so no trace-time
traps) and tabulates the final mAP/AR per variant.

Run (TPU, ~25 min for the default 6 variants):
    python scripts/micro_bf16_bisect.py [--steps 600] [--variants ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DEMO = os.path.join(HERE, "demo_synthetic_train.py")

DEFAULT_VARIANTS = [
    ("f32", None),                                   # baseline
    ("all", "sa1,sa2,sa3,sa4,fp"),                   # the known collapse
    ("sa1-only", "sa1"),                             # the big/cheap layer
    ("sa2-4", "sa2,sa3,sa4"),
    ("fp-only", "fp"),                               # feeds the vote seeds
    ("sa-all", "sa1,sa2,sa3,sa4"),                   # everything but fp
]


def run_variant(name, comps, steps, extra):
    cmd = [sys.executable, DEMO, "--steps", str(steps)] + extra
    if comps is not None:
        cmd += ["--bf16", "--bf16_components", comps]
    print(f"--- {name}: {' '.join(cmd[1:])}", flush=True)
    res = subprocess.run(cmd, capture_output=True, text=True)
    out = res.stdout + res.stderr
    sys.stdout.write(out[-2000:])
    if res.returncode != 0:
        return {"variant": name, "error": f"rc={res.returncode}"}
    # demo's final line: "final: loss A -> B; mAP@0.25 = X, AR = Y"
    def last(pattern):
        m = re.findall(pattern, out)
        return float(m[-1]) if m else None
    return {
        "variant": name,
        "components": comps or "none (f32)",
        "map25": last(r"mAP@0\.25 = ([0-9.]+)"),
        "ar25": last(r"AR = ([0-9.]+)"),
        "final_loss": last(r"-> ([0-9.]+);"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--variants", type=str, default=None,
                    help="comma-of-colon list name:comps[;...] override")
    ap.add_argument("--demo_args", type=str, default="",
                    help="extra args forwarded to demo_synthetic_train.py")
    args = ap.parse_args()

    variants = DEFAULT_VARIANTS
    if args.variants:
        variants = []
        for spec in args.variants.split(";"):
            name, _, comps = spec.partition(":")
            variants.append((name, comps or None))

    extra = args.demo_args.split() if args.demo_args else []
    rows = [run_variant(n, c, args.steps, extra) for n, c in variants]
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
