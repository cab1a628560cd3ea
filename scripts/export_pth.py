"""Export a trained run as a reference-layout .pth.

The inverse of the --use_pretrained warm-start / model.pth eval paths: when
the run holds a full CapNet (graph/caption present), the export is a FULL
``model.pth`` the reference's eval and benchmark scripts can strict-load
(/root/reference/scripts/eval.py:106-108, benchmark/predict.py:102);
otherwise (detection-only runs) it emits the backbone_net/vgen/proposal
VoteNet layout (/root/reference/scripts/train.py:80-105 consumes these).
--detection_only forces the VoteNet subset either way.

Run: python scripts/export_pth.py --folder <run_tag> [--use_last] \
        [--detection_only] [--out outputs/<run_tag>/model.pth]
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
                   help="destination .pth (default <folder>/model.pth for "
                        "full runs, votenet.pth for detection-only)")
    p.add_argument("--detection_only", action="store_true",
                   help="export only backbone_net/vgen/proposal even when "
                        "the run holds a full CapNet")
    p.add_argument("--num_vocabs", type=int, default=0,
                   help="real vocabulary size: slice a vocab-padded run's "
                        "classifier (CapNet num_vocabs_padded) back to the "
                        "reference width before export")
    return p.parse_args()


def main():
    args = parse_args()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

    import jax
    import numpy as np

    from scan2cap_tpu.config import PathConfig
    from scan2cap_tpu.convert import (
        export_capnet_checkpoint, export_votenet_checkpoint)
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    ckpt = CheckpointIO(os.path.join(folder, "ckpt"))
    # raw (target-free) restore: the export only maps known subtrees, so no
    # model construction or vocab sizing is needed
    restored = (ckpt.restore("last") if args.use_last
                else ckpt.restore_best_or_last())
    params = jax.tree.map(np.asarray, restored["params"])
    stats = jax.tree.map(np.asarray, restored["batch_stats"])

    full = (not args.detection_only
            and ("caption" in params or "graph" in params))
    if full:
        out = args.out or os.path.join(folder, "model.pth")
        sd = export_capnet_checkpoint(params, stats, out,
                                      num_vocabs=args.num_vocabs or None)
        kind = "full model"
    else:
        out = args.out or os.path.join(folder, "votenet.pth")
        sd = export_votenet_checkpoint(params, stats, out)
        kind = "detection"
    print(f"exported {kind}: {len(sd)} tensors -> {out}")


if __name__ == "__main__":
    main()
