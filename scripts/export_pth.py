"""Export a trained run's detection modules as a reference-layout .pth.

The inverse of the --use_pretrained warm-start path: emits
backbone_net/vgen/proposal as a torch state_dict under the exact key names
the reference's VoteNet modules use (/root/reference/scripts/train.py:80-105
consumes these), so a model trained in this framework can warm-start the
reference — or another run here — from a plain .pth.

Run: python scripts/export_pth.py --folder <run_tag> [--use_last] \
        [--out outputs/<run_tag>/votenet.pth]
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True,
                   help="output folder containing ckpt/")
    p.add_argument("--use_last", action="store_true",
                   help="export model_last instead of best")
    p.add_argument("--out", type=str, default="",
                   help="destination .pth (default <folder>/votenet.pth)")
    return p.parse_args()


def main():
    args = parse_args()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

    import jax
    import numpy as np

    from scan2cap_tpu.config import PathConfig
    from scan2cap_tpu.convert import export_votenet_checkpoint
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    ckpt = CheckpointIO(os.path.join(folder, "ckpt"))
    # raw (target-free) restore: the export only reads the detection
    # subtrees, so no model construction or vocab sizing is needed
    restored = (ckpt.restore("last") if args.use_last
                else ckpt.restore_best_or_last())
    params = jax.tree.map(np.asarray, restored["params"])
    stats = jax.tree.map(np.asarray, restored["batch_stats"])

    out = args.out or os.path.join(folder, "votenet.pth")
    sd = export_votenet_checkpoint(params, stats, out)
    print(f"exported {len(sd)} tensors -> {out}")


if __name__ == "__main__":
    main()
