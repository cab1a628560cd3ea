"""Pretrained ("GT feature") track end to end on fixture data — the
reference's §3.5 pipeline (SURVEY.md):

  train_maskvotenet.py -> extract_gt_features.py (train+val HDF5 dbs)
  -> train_pretrained.py (caption-only, in-training eval)
  -> eval_pretrained.py

All on CPU with the SCAN2CAP_TEST_TINY shrink knob.
"""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

from tests.test_cli_end_to_end import cli_data, REPO  # fixture reuse


def _env(cli_data):
    env = dict(os.environ)
    env.update({
        "SCAN2CAP_DATA": str(cli_data / "data"),
        "SCAN2CAP_OUTPUT": str(cli_data / "outputs"),
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "SCAN2CAP_TEST_TINY": "1",
    })
    # the variant trainers' --mesh runs below need virtual devices
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _run(args, env, timeout=900):
    res = subprocess.run([sys.executable] + args, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-1000:])
    return res


@pytest.mark.slow
def test_pretrained_gt_track(cli_data):
    env = _env(cli_data)
    data = cli_data / "data"

    # 1. MaskVoteNet pretraining (single-proposal feature extractor),
    #    driven over a DP mesh — the variant trainers share scripts/train.py's
    #    mesh wiring (parallel.shard_train_state + mesh_step_fn)
    _run([os.path.join(REPO, "scripts", "train_maskvotenet.py"),
          "--epoch", "1", "--batch_size", "2", "--num_points", "512",
          "--verbose", "1", "--mesh", "2,1", "--tag", "mvn"], env)
    mvn_run = next(p.name for p in (cli_data / "outputs").iterdir()
                   if "MVN" in p.name)

    # 2. GT-box feature extraction -> HDF5 databases (2 augmented epochs)
    _run([os.path.join(REPO, "scripts", "extract_gt_features.py"),
          "--folder", mvn_run, "--split", "train", "--epoch", "2",
          "--batch_size", "2"], env)
    _run([os.path.join(REPO, "scripts", "extract_gt_features.py"),
          "--folder", mvn_run, "--split", "val", "--batch_size", "2"], env)

    # 2b. the released-.pth path: export the trained run to a reference-
    # layout .pth and extract directly from it (no run folder), mirroring
    # the reference's PRETRAIN_MASK_VOTENET_* flow
    _run([os.path.join(REPO, "scripts", "export_pth.py"),
          "--folder", mvn_run], env)
    pth = cli_data / "outputs" / mvn_run / "votenet.pth"
    assert pth.exists()
    _run([os.path.join(REPO, "scripts", "extract_gt_features.py"),
          "--pth", str(pth), "--split", "val", "--batch_size", "2",
          "--num_points", "512",
          "--out", str(data / "gt_pth_val.hdf5")], env)
    with h5py.File(data / "gt_pth_val.hdf5", "r") as db:
        feats = next(np.asarray(db[k]) for k in db.keys()
                     if k.endswith("_features"))
        assert feats.shape[-1] == 128 and np.isfinite(feats).all()

    train_db = data / "gt_ScanRefer_features_train.hdf5"
    val_db = data / "gt_ScanRefer_features_val.hdf5"
    assert train_db.exists() and val_db.exists()
    with h5py.File(train_db, "r") as db:
        keys = list(db.keys())
        # reference key schema: "{epoch}|{scene}_gt_ids/_features/_corners"
        assert any(k.startswith("0|") and k.endswith("_features")
                   for k in keys)
        assert any(k.startswith("1|") for k in keys)  # 2nd augmented epoch
        feats = next(np.asarray(db[k]) for k in keys
                     if k.endswith("_features"))
        assert feats.shape[-1] == 128 and np.isfinite(feats).all()

    # 3. caption-only training over the stored features, with the
    #    in-training eval path (val db + organized json both present)
    _run([os.path.join(REPO, "scripts", "train_pretrained.py"),
          "--mode", "gt", "--epoch", "1", "--batch_size", "2",
          "--verbose", "1", "--val_step", "2", "--use_topdown",
          "--num_locals", "2", "--mesh", "2,1", "--tag", "pre"], env)
    pre_run = next(p for p in (cli_data / "outputs").iterdir()
                   if "PRE" in p.name)
    log = (pre_run / "log.txt").read_text()
    assert "loss" in log
    assert "[eval @ iter" in log, log           # in-training eval fired
    assert (pre_run / "ckpt" / "last").exists()

    # 4. offline eval CLI on the val database
    res = _run([os.path.join(REPO, "scripts", "eval_pretrained.py"),
                "--folder", pre_run.name, "--batch_size", "2",
                "--min_iou", "0.0"], env)
    assert "cider" in res.stdout.lower(), res.stdout[-2000:]


@pytest.mark.slow
def test_pretrained_votenet_track(cli_data):
    """Detection CapNet -> extract_votenet_features -> train_pretrained
    --mode votenet (SURVEY.md §3.5, votenet leg)."""
    env = _env(cli_data)
    data = cli_data / "data"

    # 1. detection-only CapNet training
    _run([os.path.join(REPO, "scripts", "train.py"),
          "--epoch", "1", "--batch_size", "2", "--num_points", "512",
          "--num_proposals", "16", "--verbose", "1", "--val_step", "100",
          "--no_caption", "--tag", "det"], env)
    det_run = next(p.name for p in (cli_data / "outputs").iterdir()
                   if "DET" in p.name)

    # 2. VoteNet proposal-feature extraction (NMS + objectness filtered)
    for split in ("train", "val"):
        _run([os.path.join(REPO, "scripts", "extract_votenet_features.py"),
              "--folder", det_run, "--split", split, "--batch_size", "2"],
             env)
    db_path = data / "votenet_ScanRefer_predictions_train.hdf5"
    assert db_path.exists()
    with h5py.File(db_path, "r") as db:
        keys = list(db.keys())
        assert any(k.endswith("_object_ids") for k in keys)
        assert any(k.endswith("_gt_corners") for k in keys)

    # 2b. released-.pth path: export the detector and extract directly from
    # the .pth (no run folder), mirroring the reference's PRETRAIN_VOTENET_*
    _run([os.path.join(REPO, "scripts", "export_pth.py"),
          "--folder", det_run], env)
    _run([os.path.join(REPO, "scripts", "extract_votenet_features.py"),
          "--pth", str(cli_data / "outputs" / det_run / "votenet.pth"),
          "--split", "val", "--batch_size", "2", "--num_points", "512",
          "--num_proposals", "16",
          "--out", str(data / "votenet_pth_val.hdf5")], env)
    assert (data / "votenet_pth_val.hdf5").exists()

    # 3. caption-only training over VoteNet features
    _run([os.path.join(REPO, "scripts", "train_pretrained.py"),
          "--mode", "votenet", "--epoch", "1", "--batch_size", "2",
          "--verbose", "1", "--val_step", "100", "--use_topdown",
          "--tag", "prevn"], env)
    run = next(p for p in (cli_data / "outputs").iterdir()
               if "PREVN" in p.name)
    assert (run / "ckpt" / "last").exists()
    assert "loss" in (run / "log.txt").read_text()
