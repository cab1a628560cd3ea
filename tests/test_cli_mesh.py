"""Production-trainer mesh wiring (VERDICT r4 #1): scripts/train.py --mesh
runs the REAL Solver loop (val_step caption eval, best/last/resume
checkpoints) over a 4x2 DP+TP virtual-device mesh, its first-step loss
matches the single-device run, the resume path restores a mesh checkpoint
back into mesh shardings, and scripts/eval.py --mesh reproduces the
single-device caption scores exactly (token-bitwise decode contract,
tests/test_parallel_eval.py)."""

import json
import os
import pickle
import re
import subprocess
import sys

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


def _env(cli_data):
    env = dict(os.environ)
    env.update({
        "SCAN2CAP_DATA": str(cli_data / "data"),
        "SCAN2CAP_OUTPUT": str(cli_data / "outputs"),
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "SCAN2CAP_TEST_TINY": "1",
    })
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


TRAIN_COMMON = [
    sys.executable, os.path.join(REPO, "scripts", "train.py"),
    "--batch_size", "4", "--num_points", "512", "--num_proposals", "16",
    "--verbose", "1", "--val_step", "1", "--no_augment",
    "--use_topdown", "--num_locals", "4"]


def _first_loss(run_dir):
    log = (run_dir / "log.txt").read_text()
    m = re.search(r"\bloss ([0-9.]+) cap", log)
    assert m, log
    return float(m.group(1))


def _run_dir(cli_data, tag):
    return next(p for p in (cli_data / "outputs").iterdir()
                if p.name.endswith("_" + tag.upper()))


@pytest.mark.slow
def test_train_and_eval_cli_mesh(cli_data):
    env = _env(cli_data)

    # single-device reference run
    res = subprocess.run(
        TRAIN_COMMON + ["--epoch", "1", "--tag", "ref1dev"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    loss_1dev = _first_loss(_run_dir(cli_data, "ref1dev"))

    # mesh run: same data/seed over (4,2) DP+TP; classifier auto-padded
    res = subprocess.run(
        TRAIN_COMMON + ["--epoch", "1", "--mesh", "4,2", "--tag", "mesh42"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "mesh: data=4 model=2" in res.stdout, res.stdout[-2000:]
    assert "vocab padded" in res.stdout
    run = _run_dir(cli_data, "mesh42")
    log = (run / "log.txt").read_text()
    assert "[eval @ iter" in log, log            # val_step caption eval fired
    assert (run / "ckpt" / "last").exists()
    assert (run / "ckpt" / "resume").exists()
    info = json.loads((run / "info.json").read_text())
    assert info["mesh"] == "4,2" and info["num_vocabs_padded"] >= 128

    # first-step loss matches the 1-device run (the dryrun equivalence
    # bound; trajectories diverge by Adam sign noise — CLAUDE.md r4 s5)
    loss_mesh = _first_loss(run)
    assert abs(loss_mesh - loss_1dev) <= 2e-3 * abs(loss_1dev) + 1e-3, (
        loss_mesh, loss_1dev)

    # --spatial on top of the mesh (SA query axes sharded over "model"):
    # must start up (init traces the spatial backbone under the ambient
    # mesh) and reproduce the same first-step loss (sharding is exact)
    res = subprocess.run(
        TRAIN_COMMON + ["--epoch", "1", "--mesh", "4,2", "--spatial",
                        "--tag", "spat42"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "spatial(SA query axis over model)" in res.stdout
    loss_spatial = _first_loss(_run_dir(cli_data, "spat42"))
    assert abs(loss_spatial - loss_1dev) <= 2e-3 * abs(loss_1dev) + 1e-3, (
        loss_spatial, loss_1dev)

    # resume the mesh checkpoint INTO mesh shardings via the CLI
    res = subprocess.run(
        TRAIN_COMMON + ["--epoch", "2", "--mesh", "4,2",
                        "--use_checkpoint", run.name, "--tag", "meshres"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "resumed from" in res.stdout

    # eval CLI: mesh and single-device scores must be IDENTICAL (the decode
    # token contract is bitwise; same candidates -> same printed scores)
    eval_common = [sys.executable, os.path.join(REPO, "scripts", "eval.py"),
                   "--folder", run.name, "--eval_caption", "--min_iou", "-1"]
    res_1 = subprocess.run(eval_common, env=env, capture_output=True,
                           text=True, timeout=900)
    assert res_1.returncode == 0, res_1.stderr[-3000:]
    res_m = subprocess.run(eval_common + ["--mesh", "4,2"], env=env,
                           capture_output=True, text=True, timeout=900)
    assert res_m.returncode == 0, res_m.stderr[-3000:]
    scores_1 = [l for l in res_1.stdout.splitlines() if l.startswith("[")]
    scores_m = [l for l in res_m.stdout.splitlines() if l.startswith("[")]
    assert scores_1 and scores_1 == scores_m, (scores_1, scores_m)


def test_setup_mesh_validates_batch_divisibility():
    """The shared trainer-CLI front door: the data axis must divide the
    batch size, and the message says so in that direction (a previous
    per-script copy printed the check backwards)."""
    from scan2cap_tpu.parallel import setup_mesh

    m = setup_mesh("4,2", 8)
    assert dict(m.shape) == {"data": 4, "model": 2}
    with pytest.raises(SystemExit, match=r"--batch_size 2 must be "
                                         r"divisible by the mesh data "
                                         r"axis \(4\)"):
        setup_mesh("4,1", 2)


def test_parse_mesh_rejects_bad_specs():
    from scan2cap_tpu.parallel import parse_mesh

    with pytest.raises(ValueError, match="needs"):
        parse_mesh("16,2")        # 32 devices on an 8-device host
    with pytest.raises(ValueError):
        parse_mesh("0,4")
    with pytest.raises(ValueError):
        parse_mesh("2,2,2")
    m = parse_mesh("8")           # DATA alone -> DP-only
    assert dict(m.shape) == {"data": 8, "model": 1}
