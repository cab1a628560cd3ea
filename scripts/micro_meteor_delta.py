"""Quantify the METEOR synonym-stage delta at caption-distribution scale.

VERDICT r2 weak #6 / item 8: the builtin-vs-synonym-stage shift was pinned
only on a 3-sentence fixture; a reader of a densecap table needs the shift
on a realistic caption DISTRIBUTION to compare against published numbers.

This script synthesizes ScanRefer-shaped caption pairs — a template
generator over the indoor-scene vocabulary produces a ground-truth caption,
and the "model" hypothesis is derived from it with the error modes real
captioners exhibit (synonym substitutions, dropped/inserted tokens, local
reorderings, truncation) at controlled rates — then scores every pair with
the exact+stem stage alone and with the curated domain synset table
(and the nltk wordnet stage when that corpus is installed).

Output: mean/std per backend, mean pairwise delta, and the fraction of
pairs shifted, printed as one JSON line and appended in prose to
docs/PARITY.md by hand (the numbers in that doc cite this script).

Run: python scripts/micro_meteor_delta.py [--pairs 500] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from scan2cap_tpu.eval.capeval.delta_corpus import (make_pairs,
                                                    oracle_synonym_ids)
from scan2cap_tpu.eval.capeval.meteor import _HAS_WORDNET, single_meteor_score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    pairs = make_pairs(args.pairs, args.seed)

    stages = {"exact-stem": None, "domsyn": "domsyn",
              "oracle": oracle_synonym_ids}
    if _HAS_WORDNET:
        stages["wordnet"] = "wordnet"

    scores = {name: np.array([single_meteor_score(r, h, syn_stage=st)
                              for r, h in pairs])
              for name, st in stages.items()}

    base = scores["exact-stem"]
    out = {"pairs": args.pairs, "seed": args.seed}
    for name, s in scores.items():
        out[name] = {"mean": round(float(s.mean()), 4),
                     "std": round(float(s.std()), 4)}
        if name != "exact-stem":
            d = s - base
            out[name]["delta_mean"] = round(float(d.mean()), 4)
            out[name]["delta_max"] = round(float(d.max()), 4)
            out[name]["pct_pairs_shifted"] = round(
                100.0 * float((d > 1e-9).mean()), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
