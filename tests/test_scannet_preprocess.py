"""Golden tests for the raw-ScanNet preprocessing port
(data/scannet/load_scannet_data.py + batch_load_scannet_data.py semantics):
1-indexed instances, per-instance AABBs with obj_id = instance-1, axis
alignment, detection-class box filtering, point cap."""

import json
import os

import numpy as np

from scan2cap_tpu.config import SCANNET_NYU40IDS
from scan2cap_tpu.data.scannet_preprocess import batch_export, export
from scan2cap_tpu.utils.ply import write_ply


def make_raw_scene(scan_dir, scene, rng, n=60):
    base = scan_dir / scene
    base.mkdir(parents=True)
    prefix = base / scene

    xyz = rng.rand(n, 3).astype(np.float32) * 4.0
    # two compact objects on known vertex ranges
    xyz[10:20] = np.array([1.0, 1.0, 0.5]) + rng.rand(10, 3) * 0.4
    xyz[30:45] = np.array([3.0, 2.0, 0.3]) + rng.rand(15, 3) * 0.6
    rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    write_ply(str(prefix) + "_vh_clean_2.ply", xyz, rgb, faces)

    # segments: each vertex its own segment id
    with open(str(prefix) + "_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": list(range(n))}, f)
    # aggregation: objectId 0 = chair (verts 10-19), 1 = wall (verts 30-44)
    with open(str(prefix) + ".aggregation.json", "w") as f:
        json.dump({"segGroups": [
            {"objectId": 0, "label": "chair",
             "segments": list(range(10, 20))},
            {"objectId": 1, "label": "wall",
             "segments": list(range(30, 45))},
        ]}, f)
    mat = np.eye(4)
    mat[:3, 3] = [10.0, 0.0, 0.0]
    vals = " ".join(str(v) for v in mat.reshape(-1))
    (base / f"{scene}.txt").write_text(f"axisAlignment = {vals}\n")
    return xyz


def make_label_map(path):
    with open(path, "w") as f:
        f.write("raw_category\tnyu40id\n")
        f.write("chair\t5\n")
        f.write("wall\t1\n")


def test_export_semantics(tmp_path, rng):
    scene = "scene0000_00"
    xyz = make_raw_scene(tmp_path / "scans", scene, rng)
    tsv = tmp_path / "labels.tsv"
    make_label_map(tsv)
    base = tmp_path / "scans" / scene / scene

    verts, aligned, sem, ins, bboxes, abboxes = export(
        str(base) + "_vh_clean_2.ply", str(base) + ".aggregation.json",
        str(base) + "_vh_clean_2.0.010000.segs.json", str(base) + ".txt",
        str(tsv))

    assert verts.shape == (60, 9)                  # xyz+rgb+normal
    np.testing.assert_allclose(aligned[:, 0], verts[:, 0] + 10.0, atol=1e-5)
    np.testing.assert_array_equal(np.unique(ins), [0, 1, 2])  # 1-indexed
    assert (ins[10:20] == 1).all() and (ins[30:45] == 2).all()
    assert (sem[10:20] == 5).all() and (sem[30:45] == 1).all()
    assert (sem[:10] == 0).all()                   # unannotated = 0

    # box golden: AABB of the chair's vertices; obj_id column = instance-1
    lo, hi = xyz[10:20].min(0), xyz[10:20].max(0)
    np.testing.assert_allclose(bboxes[0, :3], (lo + hi) / 2, atol=1e-5)
    np.testing.assert_allclose(bboxes[0, 3:6], hi - lo, atol=1e-5)
    assert bboxes[0, 6] == 5 and bboxes[0, 7] == 0
    assert abboxes[1, 6] == 1 and abboxes[1, 7] == 1
    np.testing.assert_allclose(abboxes[0, 0], bboxes[0, 0] + 10.0, atol=1e-5)


def test_batch_export_filters_and_caps(tmp_path, rng):
    scene = "scene0000_00"
    make_raw_scene(tmp_path / "scans", scene, rng, n=80)
    tsv = tmp_path / "labels.tsv"
    make_label_map(tsv)
    out = tmp_path / "out"

    done = batch_export(str(tmp_path / "scans"), str(out), str(tsv),
                        max_num_points=50)
    assert done == [scene]
    bboxes = np.load(out / f"{scene}_bbox.npy")
    # wall (nyu40 id 1) is not a detection class -> filtered out
    assert len(bboxes) == 1 and bboxes[0, 6] == 5
    assert 1 not in set(np.asarray(bboxes)[:, 6])
    assert 5 in SCANNET_NYU40IDS and 1 not in SCANNET_NYU40IDS
    verts = np.load(out / f"{scene}_vert.npy")
    ins = np.load(out / f"{scene}_ins_label.npy")
    assert len(verts) == 50 and len(ins) == 50    # point cap applied

    # idempotent: second run skips completed scenes
    done2 = batch_export(str(tmp_path / "scans"), str(out), str(tsv),
                         max_num_points=50)
    assert done2 == [scene]
