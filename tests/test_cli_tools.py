"""Smoke + correctness tests for the data-organization and visualization
CLIs (reference: scripts/organize_scanrefer.py, organize_referit3d.py,
Scan2CAD_to_ScanNet.py, data/scannet/visualize.py, visualize_gt_bbox.py,
export_scannet_axis_aligned_mesh.py)."""

import json
import os
import subprocess
import sys

import numpy as np

from tests.test_cli_end_to_end import REPO
from tests.test_dataset import make_fixture_scene


def _run(args, timeout=240, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    res = subprocess.run([sys.executable] + args, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-500:])
    return res


def test_organize_scanrefer(tmp_path):
    entries = [
        {"scene_id": "scene0000_00", "object_id": "3", "ann_id": "0",
         "object_name": "chair", "token": ["a", "chair"],
         "description": "a chair"},
        {"scene_id": "scene0000_00", "object_id": "3", "ann_id": "1",
         "object_name": "chair", "token": ["the", "chair"],
         "description": "the chair"},
        {"scene_id": "scene0001_00", "object_id": "0", "ann_id": "0",
         "object_name": "table", "token": ["a", "table"],
         "description": "a table"},
    ]
    with open(tmp_path / "ScanRefer_filtered.json", "w") as f:
        json.dump(entries, f)
    _run([os.path.join(REPO, "scripts", "organize_scanrefer.py"),
          "--data", str(tmp_path)])
    with open(tmp_path / "ScanRefer_filtered_organized.json") as f:
        org = json.load(f)
    assert set(org) == {"scene0000_00", "scene0001_00"}
    assert set(org["scene0000_00"]["3"]) == {"0", "1"}
    assert org["scene0001_00"]["0"]["0"]["object_name"] == "table"


def test_organize_referit3d(tmp_path):
    import csv
    rows = [
        {"scan_id": "scene0000_00", "target_id": 2,
         "instance_type": "chair", "assignmentid": "A1",
         "utterance": "The RED chair", "tokens": "['the', 'red', 'chair']"},
        {"scan_id": "scene0001_00", "target_id": 0,
         "instance_type": "table", "assignmentid": "A2",
         "utterance": "a table", "tokens": "['a', 'table']"},
    ]
    with open(tmp_path / "nr3d.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    (tmp_path / "train.txt").write_text("scene0000_00\n")
    (tmp_path / "val.txt").write_text("scene0001_00\n")
    _run([os.path.join(REPO, "scripts", "organize_referit3d.py"),
          "--csv", str(tmp_path / "nr3d.csv"), "--data", str(tmp_path),
          "--train_scenes", str(tmp_path / "train.txt"),
          "--val_scenes", str(tmp_path / "val.txt")])
    with open(tmp_path / "ReferIt3D_filtered_train.json") as f:
        train = json.load(f)
    assert len(train) == 1 and train[0]["scene_id"] == "scene0000_00"
    assert train[0]["description"] == "the red chair"   # lowercased
    assert train[0]["token"] == ["the", "red", "chair"]
    with open(tmp_path / "nr3d_organized.json") as f:
        org = json.load(f)
    assert org["scene0001_00"]["0"]["A2"]["object_name"] == "table"


def test_scan2cad_to_scannet(tmp_path):
    # 90 deg about +z: q = (w=cos45, 0, 0, z=sin45)
    s = np.sqrt(0.5)
    ann = [{"id_scan": "scene0000_00",
            "aligned_models": [
                {"trs": {"rotation": [s, 0.0, 0.0, s]}},
                {"trs": {"rotation": [1.0, 0.0, 0.0, 0.0]}},
            ]}]
    cad2inst = {"scene0000_00": {"0": 7, "1": 2}}
    with open(tmp_path / "full_annotations.json", "w") as f:
        json.dump(ann, f)
    with open(tmp_path / "aligned_cad2inst_id.json", "w") as f:
        json.dump(cad2inst, f)
    out = tmp_path / "scannet_instance_rotations.json"
    _run([os.path.join(REPO, "scripts", "scan2cad_to_scannet.py"),
          "--scan2cad", str(tmp_path), "--out", str(out)])
    with open(out) as f:
        rot = json.load(f)
    R = np.asarray(rot["scene0000_00"]["7"])
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)  # Rz(90)
    np.testing.assert_allclose(R, want, atol=1e-6)
    np.testing.assert_allclose(rot["scene0000_00"]["2"], np.eye(3), atol=1e-9)


def test_scene_check_and_gt_bbox_plys(tmp_path, rng):
    from scan2cap_tpu.utils.ply import read_ply

    scannet = tmp_path / "data" / "scannet" / "scannet_data"
    scannet.mkdir(parents=True)
    make_fixture_scene(str(scannet), "scene0000_00", rng, n_points=400)

    out1 = tmp_path / "check"
    _run([os.path.join(REPO, "scripts", "check_preprocessed_scene.py"),
          "--scannet_data", str(scannet), "--scene_id", "scene0000_00",
          "--out", str(out1)])
    pts = read_ply(str(out1 / "scene0000_00_points.ply"))["vertex"]
    assert len(pts["x"]) == 400
    assert (out1 / "scene0000_00_boxes.ply").exists()

    out2 = tmp_path / "gt"
    _run([os.path.join(REPO, "scripts", "visualize_gt_bbox.py"),
          "--scene_id", "scene0000_00", "--data", str(tmp_path / "data"),
          "--out", str(out2)])
    assert (out2 / "scene0000_00.ply").exists()


def test_export_axis_aligned_mesh(tmp_path, rng):
    from scan2cap_tpu.utils.ply import read_ply, write_ply

    scene = "scene0000_00"
    scan_dir = tmp_path / "scans" / scene
    scan_dir.mkdir(parents=True)
    xyz = rng.rand(50, 3).astype(np.float32)
    rgb = rng.randint(0, 255, (50, 3)).astype(np.uint8)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    write_ply(str(scan_dir / f"{scene}_vh_clean_2.ply"), xyz, rgb, faces)
    # axis alignment = translation by (1, 2, 3)
    mat = np.eye(4)
    mat[:3, 3] = [1.0, 2.0, 3.0]
    vals = " ".join(str(v) for v in mat.reshape(-1))
    (scan_dir / f"{scene}.txt").write_text(
        f"axisAlignment = {vals}\nnumColorFrames = 1\n")

    out = tmp_path / "aligned"
    _run([os.path.join(REPO, "scripts",
                       "export_scannet_axis_aligned_mesh.py"),
          "--scans", str(tmp_path / "scans"), "--out", str(out),
          "--scene_id", scene])
    data = read_ply(str(out / f"{scene}_aligned.ply"))
    v = data["vertex"]
    got = np.stack([v["x"], v["y"], v["z"]], 1)
    np.testing.assert_allclose(got, xyz + np.array([1, 2, 3]), atol=1e-5)
    assert len(data["face"]) == 2


def test_launch_scripts_are_valid_bash():
    import glob
    scripts = glob.glob(os.path.join(REPO, "launch", "*.sh"))
    assert len(scripts) >= 5
    for sh in scripts:
        res = subprocess.run(["bash", "-n", sh], capture_output=True,
                             text=True)
        assert res.returncode == 0, (sh, res.stderr)
        body = open(sh).read()
        assert "python" in body and "set -euo pipefail" in body, sh
