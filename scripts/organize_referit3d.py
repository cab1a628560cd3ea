"""Convert ReferIt3D (Nr3D) CSV annotations into ScanRefer-format JSONs
(scripts/organize_referit3d.py): both the flat filtered lists (train/val by
the official ScanNet split) and the nested organized map."""

from __future__ import annotations

import argparse
import json
import os
from ast import literal_eval


def parse_rows(csv_path: str):
    import pandas as pd
    df = pd.read_csv(csv_path)
    df["tokens"] = df["tokens"].apply(literal_eval)
    entries = []
    for _, row in df.iterrows():
        entries.append({
            "scene_id": row["scan_id"],
            "object_id": str(row["target_id"]),
            "object_name": row["instance_type"],
            "ann_id": str(row["assignmentid"]),
            "description": str(row["utterance"]).lower(),
            "token": row["tokens"],
        })
    return entries


def organize(entries):
    organized = {}
    for e in entries:
        organized.setdefault(e["scene_id"], {}) \
            .setdefault(e["object_id"], {})[e["ann_id"]] = e
    return organized


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--csv", type=str, required=True, help="nr3d.csv")
    p.add_argument("--data", type=str,
                   default=os.environ.get("SCAN2CAP_DATA", "data"))
    p.add_argument("--train_scenes", type=str, default=None,
                   help="scannetv2_train.txt (for the split)")
    p.add_argument("--val_scenes", type=str, default=None)
    args = p.parse_args()

    entries = parse_rows(args.csv)
    with open(os.path.join(args.data, "nr3d_organized.json"), "w") as f:
        json.dump(organize(entries), f, indent=4)

    if args.train_scenes and args.val_scenes:
        train = {l.strip() for l in open(args.train_scenes)}
        val = {l.strip() for l in open(args.val_scenes)}
        for split, scenes in (("train", train), ("val", val)):
            part = [e for e in entries if e["scene_id"] in scenes]
            out = os.path.join(args.data, f"ReferIt3D_filtered_{split}.json")
            with open(out, "w") as f:
                json.dump(part, f, indent=4)
            print(f"{split}: {len(part)} annotations -> {out}")
    print(f"total: {len(entries)} annotations")
