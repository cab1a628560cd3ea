"""Dump GT bounding boxes + scene cloud for a scene
(scripts/visualize_gt_bbox.py): PLY wireframes straight from the
preprocessed labels, no model involved."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main():
    from scan2cap_tpu.utils.ply import write_ply
    from scan2cap_tpu.utils.pc_utils import write_bbox_ply

    p = argparse.ArgumentParser()
    p.add_argument("--scene_id", type=str, required=True)
    p.add_argument("--data", type=str,
                   default=os.environ.get("SCAN2CAP_DATA", "data"))
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    base = os.path.join(args.data, "scannet", "scannet_data", args.scene_id)
    verts = np.load(base + "_aligned_vert.npy")
    bboxes = np.load(base + "_aligned_bbox.npy")

    os.makedirs(args.out, exist_ok=True)
    write_ply(os.path.join(args.out, f"{args.scene_id}.ply"),
              verts[:, :3].astype(np.float32),
              verts[:, 3:6].clip(0, 255).astype(np.uint8))

    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1])
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1])
    corners = np.stack([
        b[:3] + np.stack([sx * b[3] / 2, sy * b[4] / 2, sz * b[5] / 2], 1)
        for b in bboxes])
    write_bbox_ply(os.path.join(args.out, f"{args.scene_id}_gt_bbox.ply"),
                   corners, color=(0, 0, 255))
    print(f"wrote {len(bboxes)} GT boxes for {args.scene_id} to {args.out}")


if __name__ == "__main__":
    main()
