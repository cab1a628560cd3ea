"""End-to-end CLI test: scripts/train.py runs on generated fixture data
(tiny scenes, tiny model) including in-training caption eval, checkpoints,
and info.json — the full user path without real ScanNet."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def cli_data(tmp_path, rng):
    from tests.test_dataset import make_fixture_scene, make_fixture_glove

    data = tmp_path / "data"
    scannet = data / "scannet" / "scannet_data"
    scannet.mkdir(parents=True)
    scenes = ["scene0000_00", "scene0001_00"]
    for s in scenes:
        make_fixture_scene(str(scannet), s, rng, n_points=1500)

    words = ["this", "is", "a", "red", "chair", "big", "table"]
    glove = make_fixture_glove(words)
    with open(data / "glove.p", "wb") as f:
        pickle.dump(glove, f)

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

    with open(data / "ScanRefer_filtered_train.json", "w") as f:
        json.dump(entries(scenes), f)
    with open(data / "ScanRefer_filtered_val.json", "w") as f:
        json.dump(entries(scenes[1:]), f)
    organized = {}
    for e in entries(scenes):
        organized.setdefault(e["scene_id"], {}).setdefault(
            e["object_id"], {})[e["ann_id"]] = e
    with open(data / "ScanRefer_filtered_organized.json", "w") as f:
        json.dump(organized, f)
    return tmp_path


@pytest.mark.slow
def test_train_cli_runs(cli_data):
    env = dict(os.environ)
    env.update({
        "SCAN2CAP_DATA": str(cli_data / "data"),
        "SCAN2CAP_OUTPUT": str(cli_data / "outputs"),
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "SCAN2CAP_TEST_TINY": "1",   # shrink the architecture (see train.py)
    })
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "--epoch", "1", "--batch_size", "2", "--num_points", "512",
         "--num_proposals", "16", "--verbose", "1", "--val_step", "2",
         "--use_topdown", "--num_locals", "4", "--num_graph_steps", "2",
         "--use_relation", "--profile", "1", "--tag", "citest"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    out_root = cli_data / "outputs"
    runs = list(out_root.iterdir())
    assert len(runs) == 1
    run = runs[0]
    assert (run / "info.json").exists()
    assert (run / "log.txt").exists()
    assert (run / "ckpt" / "last").exists()
    log = (run / "log.txt").read_text()
    assert "loss" in log
    # in-training eval fired (val_step=2, 2 iters/epoch)
    assert "[eval @ iter" in log, log
    # --profile 1 wrote a jax.profiler trace of the first warm step
    assert (run / "profile").is_dir(), list(run.iterdir())
    assert any((run / "profile").rglob("*")), "empty profile dir"

    # AOT serving export (jax.export StableHLO) + load/run round trip —
    # the load side needs no model code
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         "--folder", run.name],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    art = run / "model.stablehlo"
    assert art.exists() and (run / "model.stablehlo.vocab.json").exists()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         "--load", str(art), "--check"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "check ok" in res.stdout, res.stdout[-500:]

    # reverse converter: trained FULL run -> reference-layout model.pth ->
    # load through the forward converter (the reference's
    # scripts/eval.py:106-108 contract, detection + graph + caption)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_pth.py"),
         "--folder", run.name],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    pth = run / "model.pth"
    assert pth.exists()
    from scan2cap_tpu.convert import convert_capnet_checkpoint
    back_p, back_s = convert_capnet_checkpoint(str(pth))
    assert set(back_p) >= {"backbone_net", "vgen", "proposal",
                           "graph", "caption"}
    assert "mlp" in back_p["backbone_net"]["sa1"]
    assert "map_topdown" in back_p["caption"]
    assert "map_edge_0" in back_p["graph"]["gc_0"]

    # --detection_only keeps the VoteNet-subset export available
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_pth.py"),
         "--folder", run.name, "--detection_only"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert (run / "votenet.pth").exists()


@pytest.mark.slow
def test_train_cli_resume(cli_data):
    env = dict(os.environ)
    env.update({
        "SCAN2CAP_DATA": str(cli_data / "data"),
        "SCAN2CAP_OUTPUT": str(cli_data / "outputs"),
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "SCAN2CAP_TEST_TINY": "1",
    })
    common = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
              "--batch_size", "2", "--num_points", "512",
              "--num_proposals", "16", "--verbose", "1", "--val_step", "100",
              "--no_caption"]
    res = subprocess.run(common + ["--epoch", "1", "--tag", "resume_a"],
                         env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    run = next(p.name for p in (cli_data / "outputs").iterdir()
               if "RESUME_A" in p.name)
    res = subprocess.run(
        common + ["--epoch", "2", "--tag", "resume_b",
                  "--use_checkpoint", run],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "resumed from" in res.stdout
    run_b = next(p for p in (cli_data / "outputs").iterdir()
                 if "RESUME_B" in p.name)
    log = (run_b / "log.txt").read_text()
    # only the remaining single epoch ran, and it is numbered GLOBALLY
    # (epoch 2 of 2): resume continues LR/BN schedules at the restored
    # epoch and re-records global epochs in the resume bundle
    assert "epoch 2 starting..." in log
    assert "epoch 1 starting..." not in log
    assert log.count("starting...") == 1
