"""Project 2D semantic labels onto scene points for visual sanity checks
(scripts/project_multiview_labels.py): same projection path as the feature
projection, majority-vote aggregation across frames, PLY output colored by
class for eyeballing (README.md:133-136)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from scan2cap_tpu.utils.colors import NYU40_COLORS

# nyu40 color palette: label 0 = unlabeled (black), labels 1-20 are the
# shared byte-identical NYU40 table (ONE copy, utils/colors.py)
PALETTE = np.concatenate(
    [np.zeros((1, 3), np.uint8),
     np.asarray(NYU40_COLORS[:20], np.uint8)], axis=0)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--scannet_data", type=str, required=True)
    p.add_argument("--frames_root", type=str, required=True)
    p.add_argument("--labels_root", type=str, required=True,
                   help="per-frame label pngs or npys at projector dims")
    p.add_argument("--scene_id", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="output ply")
    p.add_argument("--frame_skip", type=int, default=20)
    return p.parse_args()


def main():
    from scan2cap_tpu.data.projection import (
        ProjectionHelper, SCANNET_INTRINSICS, PROJECTOR_IMAGE_DIMS,
        DEPTH_MIN, DEPTH_MAX, PROJECTION_ACCURACY)
    from scan2cap_tpu.utils.ply import write_ply
    from project_multiview_features import load_pose, load_depth

    args = parse_args()
    projector = ProjectionHelper(SCANNET_INTRINSICS, DEPTH_MIN, DEPTH_MAX,
                                 PROJECTOR_IMAGE_DIMS, PROJECTION_ACCURACY)
    verts = np.load(os.path.join(args.scannet_data,
                                 args.scene_id + "_aligned_vert.npy"))
    points = verts[:, :3]
    N = len(points)
    votes = np.zeros((N, 41), np.int32)

    pose_dir = os.path.join(args.frames_root, args.scene_id, "pose")
    depth_dir = os.path.join(args.frames_root, args.scene_id, "depth")
    label_dir = os.path.join(args.labels_root, args.scene_id)
    for f in sorted(os.listdir(pose_dir))[::args.frame_skip]:
        frame_id = os.path.splitext(f)[0]
        label_path = os.path.join(label_dir, frame_id + ".npy")
        if not os.path.exists(label_path):
            continue
        pose = load_pose(os.path.join(pose_dir, f))
        depth = load_depth(os.path.join(depth_dir, frame_id + ".png"),
                           PROJECTOR_IMAGE_DIMS)
        proj = projector.compute_projection(points, depth, pose)  # (h, w) row-major
        if proj is None:
            continue
        ind3d, ind2d = proj
        labels = np.load(label_path)                      # (H, W) int
        scat = projector.project(labels.astype(np.float32)[None],
                                 ind3d, ind2d, N)[0].astype(int)
        hit = np.zeros(N, bool)
        hit[ind3d[1:1 + ind3d[0]]] = True
        votes[hit, np.clip(scat[hit], 0, 40)] += 1

    assigned = votes.argmax(-1)
    assigned[votes.sum(-1) == 0] = 0
    rgb = PALETTE[np.clip(assigned, 0, len(PALETTE) - 1)]
    write_ply(args.out, points.astype(np.float32), rgb)
    print(f"wrote {args.out} ({int((votes.sum(-1) > 0).sum())}/{N} labeled)")


if __name__ == "__main__":
    main()
