"""Scan2Cap-2D CLI end to end (reference Scan2Cap-2D/main.py):
--train then --eval on a synthetic feature database, plus the retrieval
model's bank build."""

import json
import os
import pickle
import subprocess
import sys

import h5py
import numpy as np
import pytest

from tests.test_cli_end_to_end import REPO
from tests.test_dataset import make_fixture_glove


@pytest.fixture
def twod_data(tmp_path, rng):
    from scan2cap_tpu.twod.conf import (
        GLOBAL_FEATURE_SIZE, TARGET_FEATURE_SIZE)

    data = tmp_path / "data"
    d2 = tmp_path / "2d"
    data.mkdir()
    d2.mkdir()

    words = ["this", "is", "a", "red", "chair", "table"]
    with open(data / "glove.p", "wb") as f:
        pickle.dump(make_fixture_glove(words), f)

    def entries(scene_ids):
        out = []
        for s in scene_ids:
            for obj in range(2):
                out.append({
                    "scene_id": s, "object_id": str(obj),
                    "object_name": "chair", "ann_id": "0",
                    "token": ["this", "is", "a", "red", "chair"],
                    "description": "this is a red chair"})
        return out

    train = entries(["scene0000_00", "scene0001_00"])
    val = entries(["scene0002_00"])
    with open(data / "ScanRefer_filtered_train.json", "w") as f:
        json.dump(train, f)
    with open(data / "ScanRefer_filtered_val.json", "w") as f:
        json.dump(val, f)

    with h5py.File(d2 / "annotated_oracle_features.hdf5", "w") as db:
        for e in train + val:
            sid = "{}-{}_{}".format(e["scene_id"], e["object_id"],
                                    e["ann_id"])
            g = db.create_group(sid)
            g["g_feat"] = rng.randn(GLOBAL_FEATURE_SIZE).astype(np.float32)
            g["t_feat"] = rng.randn(TARGET_FEATURE_SIZE).astype(np.float32)
            g["c_feats"] = rng.randn(3, TARGET_FEATURE_SIZE).astype(np.float32)
    return tmp_path


def _run(args, twod_data, timeout=600):
    env = dict(os.environ)
    env.update({
        "SCAN2CAP_DATA": str(twod_data / "data"),
        "SCAN2CAP_OUTPUT": str(twod_data / "outputs"),
        "SCAN2CAP_2D_DATA": str(twod_data / "2d"),
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
    })
    res = subprocess.run(
        [sys.executable, "-m", "scan2cap_tpu.twod.main"] + args,
        env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-500:])
    return res


@pytest.mark.slow
def test_twod_train_eval_snt(twod_data):
    _run(["--train", "--epoch", "2", "--batch_size", "2", "--model", "snt",
          "--tag", "t"], twod_data)
    assert (twod_data / "outputs" / "2d_snt_t" / "ckpt").exists()
    res = _run(["--eval", "--batch_size", "2", "--model", "snt",
                "--tag", "t"], twod_data)
    assert "CIDEr" in res.stdout, res.stdout[-1000:]


@pytest.mark.slow
def test_twod_train_eval_tdbu(twod_data):
    _run(["--train", "--epoch", "1", "--batch_size", "2", "--model", "tdbu",
          "--tag", "t"], twod_data)
    res = _run(["--eval", "--batch_size", "2", "--model", "tdbu",
                "--tag", "t"], twod_data)
    assert "BLEU-4" in res.stdout, res.stdout[-1000:]


def test_twod_retrieval_bank(twod_data):
    res = _run(["--train", "--model", "retr"], twod_data)
    assert "retrieval bank built: 4 samples" in res.stdout, res.stdout


def test_twod_prep_builds_database(twod_data, rng):
    # --prep: viewpoint renders + box json -> feature HDF5 with the
    # TwoDDataset schema (offline extractor fallback, no downloads)
    from scan2cap_tpu.twod.conf import TARGET_FEATURE_SIZE
    from PIL import Image

    images = twod_data / "renders"
    images.mkdir()
    boxes = {}
    with open(twod_data / "data" / "ScanRefer_filtered_train.json") as f:
        import json
        train = json.load(f)
    with open(twod_data / "data" / "ScanRefer_filtered_val.json") as f:
        val = json.load(f)
    for e in train + val:
        sid = "{}-{}_{}".format(e["scene_id"], e["object_id"], e["ann_id"])
        img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(images / f"{sid}.jpg")
        boxes[sid] = [
            {"box": [10, 10, 60, 60], "is_target": True},
            {"box": [100, 50, 180, 120], "is_target": False},
        ]
    with open(twod_data / "boxes.json", "w") as f:
        import json as _json
        _json.dump(boxes, f)

    # write to a fresh db path so the fixture db isn't clobbered
    out_2d = twod_data / "2d_prep"
    out_2d.mkdir()
    env_extra = {"SCAN2CAP_2D_DATA": str(out_2d)}
    envd = dict(os.environ)
    envd.update({
        "SCAN2CAP_DATA": str(twod_data / "data"),
        "SCAN2CAP_OUTPUT": str(twod_data / "outputs"),
        "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
    })
    envd.update(env_extra)
    res = subprocess.run(
        [sys.executable, "-m", "scan2cap_tpu.twod.main", "--prep",
         "--images_root", str(images), "--boxes",
         str(twod_data / "boxes.json")],
        env=envd, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-500:])

    db_path = out_2d / "annotated_oracle_features.hdf5"
    assert db_path.exists()
    with h5py.File(db_path, "r") as db:
        assert len(db.keys()) == 6                # 4 train + 2 val samples
        g = db["scene0000_00-0_0"]
        assert g["g_feat"].shape == (2048,)
        assert g["t_feat"].shape == (TARGET_FEATURE_SIZE,)
        assert g["c_feats"].shape == (1, TARGET_FEATURE_SIZE)
        assert np.isfinite(np.asarray(g["t_feat"])).all()
