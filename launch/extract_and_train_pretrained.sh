#!/usr/bin/env bash
# GT-feature pipeline: extract per-box features then train the caption-only
# model (mirror of slurm/extract.job + train_pretrained.job).
set -euo pipefail
python scripts/extract_gt_features.py --folder "$1" --split train --epoch 100
python scripts/extract_gt_features.py --folder "$1" --split val --epoch 1
python scripts/train_pretrained.py --mode gt --use_topdown --use_relation \
    --num_graph_steps 2 --num_locals 10 --tag "${TAG:-pretrained_gt}"
