"""Build ScanRefer_filtered_organized.json (scripts/organize_scanrefer.py):
nested scene → object → annotation map."""

from __future__ import annotations

import argparse
import json
import os


def organize(scanrefer):
    organized = {}
    for data in scanrefer:
        organized.setdefault(data["scene_id"], {}) \
            .setdefault(data["object_id"], {})[data["ann_id"]] = data
    return organized


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str,
                   default=os.environ.get("SCAN2CAP_DATA", "data"))
    args = p.parse_args()
    src = os.path.join(args.data, "ScanRefer_filtered.json")
    with open(src) as f:
        scanrefer = json.load(f)
    out = os.path.join(args.data, "ScanRefer_filtered_organized.json")
    with open(out, "w") as f:
        json.dump(organize(scanrefer), f, indent=4)
    print(f"wrote {out}")
