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

from scan2cap_tpu.eval.capeval.meteor import _HAS_WORDNET, single_meteor_score
from scan2cap_tpu.eval.capeval.synonyms import SYNONYM_GROUPS

OBJECTS = ["chair", "table", "couch", "bed", "desk", "cabinet", "shelf",
           "toilet", "sink", "refrigerator", "television", "trashcan",
           "lamp", "door", "window", "pillow", "monitor", "stool",
           "dresser", "bookshelf", "curtain", "mirror", "bench", "box"]
COLORS = ["black", "white", "brown", "gray", "red", "blue", "green", "tan",
          "dark", "light", "beige", "purple"]
SIZES = ["small", "large", "big", "tall", "long", "round", "rectangular",
         "narrow", "wide", "tiny", "square", "flat"]
ANCHORS = ["wall", "door", "window", "corner", "bed", "table", "desk",
           "couch", "shelf", "sink", "doorway", "counter"]
RELATIONS = ["next to", "near", "under", "above", "beside", "behind",
             "in front of", "to the left of", "to the right of",
             "across from", "between", "against"]
VERBS = ["is", "sits", "stands", "is placed", "is located", "rests",
         "is positioned", "hangs"]

TEMPLATES = [
    "sos this is a {size} {color} {obj} . it {verb} {rel} the {anchor} . eos",
    "sos the {color} {obj} {verb} {rel} the {anchor} . it is {size} . eos",
    "sos there is a {size} {obj} {rel} the {anchor} . it is {color} . eos",
    "sos a {color} {size} {obj} . the {obj} {verb} {rel} the {anchor} . eos",
]

# word -> candidate synonym substitutions, derived from the same curated
# groups the domsyn stage uses (so substitutions are realistic paraphrases,
# not random noise) plus common caption near-synonyms the table REJECTS
# (table/desk, cup/mug) to keep the hypothesis distribution honest.
_SUBS = {}
for group in SYNONYM_GROUPS:
    for w in group:
        _SUBS.setdefault(w, []).extend(x for x in group if x != w)
for a, b in (("table", "desk"), ("desk", "table"), ("trashcan", "bin"),
             ("television", "screen"), ("cabinet", "cupboard")):
    _SUBS.setdefault(a, []).append(b)


def make_pair(rs: np.random.RandomState):
    fields = dict(
        size=rs.choice(SIZES), color=rs.choice(COLORS),
        obj=rs.choice(OBJECTS), verb=rs.choice(VERBS),
        rel=rs.choice(RELATIONS), anchor=rs.choice(ANCHORS))
    ref = rs.choice(TEMPLATES).format(**fields)
    toks = ref.split()
    out = []
    for t in toks:
        r = rs.rand()
        if r < 0.18 and t in _SUBS:                 # synonym substitution
            out.append(_SUBS[t][rs.randint(len(_SUBS[t]))])
        elif r < 0.24 and t not in ("sos", "eos"):  # drop
            continue
        else:
            out.append(t)
    # local swap
    if len(out) > 4 and rs.rand() < 0.3:
        i = rs.randint(1, len(out) - 2)
        out[i], out[i + 1] = out[i + 1], out[i]
    # truncation (decoder ran out of steps)
    if len(out) > 6 and rs.rand() < 0.15:
        out = out[: rs.randint(6, len(out))]
    return ref, " ".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rs = np.random.RandomState(args.seed)
    pairs = [make_pair(rs) for _ in range(args.pairs)]

    stages = {"exact-stem": None, "domsyn": "domsyn"}
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
