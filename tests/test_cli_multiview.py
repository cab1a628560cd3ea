"""Multiview feature pipeline CLI test: compute_multiview_features.py ->
project_multiview_features.py on a geometrically-constructed fixture
(identity camera, known depth pixel), verifying the projected features land
on exactly the depth-consistent point."""

import os
import subprocess
import sys

import h5py
import numpy as np
from PIL import Image

from tests.test_cli_end_to_end import REPO


def _run(args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable] + args, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-500:])
    return res


def test_multiview_feature_pipeline(tmp_path, rng):
    from scan2cap_tpu.data.projection import PROJECTOR_IMAGE_DIMS

    scene = "scene0000_00"
    w, h = PROJECTOR_IMAGE_DIMS                    # (41, 32)

    # scene points: index 0 visible at 1m straight ahead of an identity
    # camera; index 1 out of frustum; index 2 fails the depth check
    scannet = tmp_path / "scannet_data"
    scannet.mkdir()
    verts = np.zeros((3, 9), np.float32)
    verts[0, :3] = [0, 0, 1.0]
    verts[1, :3] = [50, 0, 1.0]
    verts[2, :3] = [0, 0, 2.0]
    np.save(scannet / f"{scene}_aligned_vert.npy", verts)

    frames = tmp_path / "frames" / scene
    (frames / "color").mkdir(parents=True)
    (frames / "pose").mkdir()
    (frames / "depth").mkdir()
    img = (rng.rand(256, 328, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(frames / "color" / "000000.jpg")
    np.savetxt(frames / "pose" / "000000.txt", np.eye(4))
    depth_mm = np.full((h, w), 60000, np.uint16)   # 60 m: beyond depth_max
    depth_mm[16, 20] = 1000                        # center pixel = 1 m
    Image.fromarray(depth_mm).save(frames / "depth" / "000000.png")

    # 1. per-frame ENet features (random init; geometry is what's under test)
    feat_root = tmp_path / "feats"
    _run([os.path.join(REPO, "scripts", "compute_multiview_features.py"),
          "--frames_root", str(tmp_path / "frames"),
          "--out_root", str(feat_root), "--batch_size", "1"])
    feat = np.load(feat_root / scene / "000000.npy")
    assert feat.shape == (128, h, w)

    # 2. project onto the scene points
    out_db = tmp_path / "enet_feats_maxpool.hdf5"
    _run([os.path.join(REPO, "scripts", "project_multiview_features.py"),
          "--scannet_data", str(scannet),
          "--frames_root", str(tmp_path / "frames"),
          "--features_root", str(feat_root),
          "--out", str(out_db), "--maxpool", "--frame_skip", "1"])

    with h5py.File(out_db, "r") as db:
        agg = np.asarray(db[scene])                # (3, 128)
    assert agg.shape == (3, 128)
    # point 0 receives the feature column at its pixel (v=16, u=20) —
    # INCLUDING negative PReLU channels: first coverage FILLS (reference
    # project_multiview_features.py:178-195); only repeat coverage
    # max-pools, so single-frame values are never clamped against the
    # zero init
    np.testing.assert_allclose(agg[0], feat[:, 16, 20], atol=1e-5)
    assert np.abs(agg[0]).max() > 0
    # the culled / depth-inconsistent points stay zero
    np.testing.assert_array_equal(agg[1], 0)
    np.testing.assert_array_equal(agg[2], 0)


def test_multiview_label_projection(tmp_path, rng):
    from scan2cap_tpu.data.projection import PROJECTOR_IMAGE_DIMS
    from scan2cap_tpu.utils.ply import read_ply

    scene = "scene0000_00"
    w, h = PROJECTOR_IMAGE_DIMS

    scannet = tmp_path / "scannet_data"
    scannet.mkdir()
    verts = np.zeros((2, 9), np.float32)
    verts[0, :3] = [0, 0, 1.0]
    verts[1, :3] = [50, 0, 1.0]
    np.save(scannet / f"{scene}_aligned_vert.npy", verts)

    frames = tmp_path / "frames" / scene
    (frames / "pose").mkdir(parents=True)
    (frames / "depth").mkdir()
    np.savetxt(frames / "pose" / "000000.txt", np.eye(4))
    depth_mm = np.full((h, w), 60000, np.uint16)
    depth_mm[16, 20] = 1000
    Image.fromarray(depth_mm).save(frames / "depth" / "000000.png")

    labels = tmp_path / "labels" / scene
    labels.mkdir(parents=True)
    lab = np.zeros((h, w), np.int32)
    lab[16, 20] = 5                                 # chair at the hit pixel
    np.save(labels / "000000.npy", lab)

    out = tmp_path / "labels.ply"
    _run([os.path.join(REPO, "scripts", "project_multiview_labels.py"),
          "--scannet_data", str(scannet),
          "--frames_root", str(tmp_path / "frames"),
          "--labels_root", str(tmp_path / "labels"),
          "--scene_id", scene, "--out", str(out), "--frame_skip", "1"])
    v = read_ply(str(out))["vertex"]
    # point 0 colored with the nyu40-5 palette entry, point 1 unlabeled
    assert (v["red"][0], v["green"][0], v["blue"][0]) == (188, 189, 34)
    assert (v["red"][1], v["green"][1], v["blue"][1]) == (0, 0, 0)
