"""Collective-bytes scaling sweep over the flagship dryrun (TPU_DESIGN §12).

Runs __graft_entry__._flagship_stage compile-only (SCAN2CAP_DRYRUN_FLAGSHIP_
EXEC=0) on the 8-virtual-CPU mesh over a (batch x vocab-pad) grid and fits
the per-step ICI traffic of BOTH headline paths as

    bytes/step = fixed + per_scene * global_batch

— the projection basis for multi-chip scaling (VERDICT r4 #6 extends the
round-4 train-only fit to the EVAL path).  Every point is the exact
optimized-HLO byte count a real (4,2) run would move; no execution happens,
so each point costs only the XLA compile (~1-3 min cold, cached after).

Run: JAX_PLATFORMS=cpu python scripts/micro_collective_sweep.py \
        --out docs/measurements/r5/collective_sweep.json
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(batch: int, vocab_pad: bool, n_devices: int = 8) -> dict:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env.update({
        "XLA_FLAGS": " ".join(flags),
        "JAX_PLATFORMS": "cpu",
        "SCAN2CAP_DRYRUN_FLAGSHIP_EXEC": "0",
        "SCAN2CAP_DRYRUN_FLAGSHIP_BATCH": str(batch),
        "SCAN2CAP_DRYRUN_VOCAB_PAD": "1" if vocab_pad else "0",
    })
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import __graft_entry__ as g; g._flagship_stage({n_devices})")
    res = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=3600)
    if res.returncode != 0:
        raise RuntimeError(f"point B={batch} pad={vocab_pad} failed:\n"
                           + res.stderr[-2000:])
    out = {}
    for path in ("eval", "train"):
        m = re.search(rf"{path} collectives/step: (\{{[^}}]*\}})", res.stdout)
        assert m, (path, res.stdout[-2000:])
        out[path] = ast.literal_eval(m.group(1))
    return out


def fit_linear(points):
    """(batch, bytes) pairs -> (fixed, per_scene) from the two extreme
    batch points (the round-4 study showed the model is linear; more points
    over-determine it and the residual is reported)."""
    points = sorted(points)
    (b0, y0), (b1, y1) = points[0], points[-1]
    if b1 == b0:
        # single batch point: no slope to fit — report the raw measurement
        # instead of crashing after the multi-minute compile points ran
        return {"fixed_mb": None, "per_scene_mb": None,
                "max_residual_mb": None,
                "single_point_mb": round(y0 / 1e6, 2)}
    per_scene = (y1 - y0) / (b1 - b0)
    fixed = y0 - per_scene * b0
    resid = max(abs(fixed + per_scene * b - y) for b, y in points)
    return {"fixed_mb": round(fixed / 1e6, 2),
            "per_scene_mb": round(per_scene / 1e6, 3),
            "max_residual_mb": round(resid / 1e6, 3)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="8,16")
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    result = {"mesh": "(4,2)", "shapes": "N=40000 K=256 locals=10 vocab=3433",
              "points": [], "fits": {}}
    for pad in (False, True):
        for b in batches:
            print(f"compiling point B={b} vocab_pad={pad}...", flush=True)
            coll = run_point(b, pad)
            result["points"].append(
                {"batch": b, "vocab_pad": pad,
                 "eval": coll["eval"], "train": coll["train"]})
            print(f"  eval {coll['eval']['total']/1e6:.2f} MB/step, "
                  f"train {coll['train']['total']/1e6:.2f} MB/step",
                  flush=True)
    for path in ("eval", "train"):
        for pad in (False, True):
            pts = [(pt["batch"], pt[path]["total"])
                   for pt in result["points"] if pt["vocab_pad"] == pad]
            result["fits"][f"{path}_{'padded' if pad else 'unpadded'}"] = \
                fit_linear(pts)
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
