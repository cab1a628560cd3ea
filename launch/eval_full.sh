#!/usr/bin/env bash
# Caption + detection evaluation of a trained run (mirror of slurm/eval.job).
set -euo pipefail
python scripts/eval.py --folder "$1" --eval_caption --eval_detection
