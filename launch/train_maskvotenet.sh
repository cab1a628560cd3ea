#!/usr/bin/env bash
# MaskVoteNet feature-extractor pretraining (mirror of slurm/train_maskvotenet.job).
set -euo pipefail
python scripts/train_maskvotenet.py --batch_size 16 --epoch 20 \
    --use_multiview --use_normal --tag "${TAG:-maskvotenet}"
