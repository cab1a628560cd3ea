"""Project per-frame ENet features onto scene points
(scripts/project_multiview_features.py).

For every scene: loop over sampled frames, compute the 3D↔2D correspondence
(depth-consistency-checked), scatter the 128-d frame features onto points,
and aggregate across frames by max-pool (--maxpool) or first-write; writes
one ``enet_feats_maxpool.hdf5`` with a (num_points, 128) dataset per scene
(:169-207).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--scannet_data", type=str, required=True,
                   help="dir with <scene>_aligned_vert.npy files")
    p.add_argument("--frames_root", type=str, required=True,
                   help="<root>/<scene>/{depth,pose}/<frame> layout")
    p.add_argument("--features_root", type=str, required=True,
                   help="per-frame ENet feature npys")
    p.add_argument("--out", type=str, required=True, help="output hdf5")
    p.add_argument("--maxpool", action="store_true")
    p.add_argument("--frame_skip", type=int, default=20)
    return p.parse_args()


def load_pose(path):
    return np.loadtxt(path).reshape(4, 4)


def load_depth(path, dims=(41, 32)):
    from PIL import Image
    img = Image.open(path)
    img = img.resize(dims, Image.NEAREST)
    return np.asarray(img, np.float32) / 1000.0   # mm -> m


def main():
    import h5py
    from scan2cap_tpu.data.projection import (
        ProjectionHelper, SCANNET_INTRINSICS, PROJECTOR_IMAGE_DIMS,
        DEPTH_MIN, DEPTH_MAX, PROJECTION_ACCURACY)

    args = parse_args()
    projector = ProjectionHelper(SCANNET_INTRINSICS, DEPTH_MIN, DEPTH_MAX,
                                 PROJECTOR_IMAGE_DIMS, PROJECTION_ACCURACY)

    scenes = sorted(
        f[:-len("_aligned_vert.npy")] for f in os.listdir(args.scannet_data)
        if f.endswith("_aligned_vert.npy"))
    with h5py.File(args.out, "w") as db:
        for scene_id in scenes:
            verts = np.load(os.path.join(args.scannet_data,
                                         scene_id + "_aligned_vert.npy"))
            points = verts[:, :3]
            N = len(points)
            agg = np.zeros((N, 128), np.float32)
            written = np.zeros(N, bool)

            pose_dir = os.path.join(args.frames_root, scene_id, "pose")
            depth_dir = os.path.join(args.frames_root, scene_id, "depth")
            feat_dir = os.path.join(args.features_root, scene_id)
            if not os.path.isdir(pose_dir):
                continue
            frames = sorted(os.listdir(pose_dir))[::args.frame_skip]
            for f in frames:
                frame_id = os.path.splitext(f)[0]
                feat_path = os.path.join(feat_dir, frame_id + ".npy")
                if not os.path.exists(feat_path):
                    continue
                pose = load_pose(os.path.join(pose_dir, f))
                depth = load_depth(os.path.join(depth_dir, frame_id + ".png"),
                                   PROJECTOR_IMAGE_DIMS)
                proj = projector.compute_projection(points, depth, pose)  # (h, w) row-major
                if proj is None:
                    continue
                ind3d, ind2d = proj
                feat = np.load(feat_path)                 # (128, H, W)
                scattered = projector.project(feat, ind3d, ind2d, N).T  # (N,128)
                hit = np.zeros(N, bool)
                hit[ind3d[1:1 + ind3d[0]]] = True
                if args.maxpool:
                    # reference semantics (project_multiview_features.py:
                    # 178-195): first coverage FILLS, repeat coverage
                    # max-pools — max-pooling against the zero init would
                    # clamp negative ENet (PReLU) channel values
                    first = hit & ~written
                    agg[first] = scattered[first]
                    again = hit & written
                    agg[again] = np.maximum(agg[again], scattered[again])
                else:
                    first = hit & ~written
                    agg[first] = scattered[first]
                written |= hit
            db.create_dataset(scene_id, data=agg, compression="gzip")
            print(f"{scene_id}: {int(written.sum())}/{N} points covered")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
