#!/usr/bin/env bash
# Offline benchmark prediction + scoring (mirror of slurm/predict.job).
set -euo pipefail
python benchmark/predict.py --folder "$1" --split val
python benchmark/eval.py --path "outputs/$1/pred.json" \
    --gt_path "${SCAN2CAP_DATA:-data}/ScanRefer_filtered_val_gt_bbox.json"
