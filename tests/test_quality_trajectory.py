"""Quality-trajectory regression gate (VERDICT r3 item 6).

The bf16 study (TPU_DESIGN §8) proved training-quality regressions here
are silent and COMPOUNDING — op-level parity tests stay green while mAP
collapses.  The in-repo gate is the checked-in full-scale synthetic
training curve (docs/measurements/r4/quality_trajectory.json, produced by
scripts/quality_trajectory.py on the TPU) with loose pinned bounds: any
future change that silently degrades training must regenerate the
artifact, and a regenerated artifact below the bounds fails here.

A slow smoke additionally re-runs the tiny trajectory end-to-end on CPU so
the measurement path itself (staging, eval hooks, CiDEr-vs-GT plumbing)
stays executable.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "docs", "measurements", "r4",
                        "quality_trajectory.json")


def _load():
    assert os.path.exists(ARTIFACT), (
        "quality trajectory artifact missing — run "
        "scripts/quality_trajectory.py --out docs/measurements/r4/"
        "quality_trajectory.json on the TPU and commit the curve")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_is_flagship_full_scale():
    art = _load()
    c = art["config"]
    assert c["flagship"] and not c["tiny"]
    assert c["num_points"] == 40000 and c["num_proposals"] == 256
    assert c["steps"] >= 600
    curve = art["curve"]
    assert len(curve["step"]) >= 10  # a curve, not just endpoints


def test_artifact_quality_bounds():
    """Loose pinned bounds — the gate for silent training-quality
    regressions.  Measured curve (2026-08-19, seed 42, the v2 study's
    32-scene held-out eval — --eval_batches 4): mAP@0.25 peaks 0.331 /
    ends 0.331, CiDEr(train) peaks 6.29 / ends 1.01 (the final point dips
    with a genuine constant-lr loss spike, visible in cap_loss
    0.054->0.55), loss 34.1 -> 4.55.  Bounds sit at roughly half the
    measured values — the bf16 failure mode this gate exists for scored
    mAP 0.001 (TPU_DESIGN §8), far below any of them."""
    art = _load()
    final = art["final"]
    curve = art["curve"]
    assert max(curve["map25"]) >= 0.2, curve["map25"]
    assert final["map25"] >= 0.15, final
    assert max(curve["cider_train"]) >= 2.0, curve["cider_train"]
    assert final["cider_train"] >= 0.4, final
    assert final["loss"] < curve["loss"][1] * 0.5, (
        "loss did not at least halve over training")
    # the curve must actually RISE (not start high from a lucky init)
    assert curve["map25"][0] < 0.05


MESH_ARTIFACT = os.path.join(REPO, "docs", "measurements", "r5",
                             "quality_trajectory_mesh_tiny.json")


def test_mesh_trajectory_quality_bounds():
    """Mesh-training silent-regression gate (VERDICT r4 #5): the committed
    150-step tiny trajectory on the 8-virtual-CPU (4,2) DP+TP mesh (vocab-
    padded classifier, the scripts/train.py --mesh wiring) must show real
    learning.  Measured curve (2026-08-20, seed 42): loss 30.94 -> 19.49,
    cap_loss 2.14 -> 0.24, cap_acc 0.12 -> 0.955.  Detection mAP is NOT
    pinned — 150 steps at 512 points is far before detection lifts off
    (the single-device tiny config behaves the same); the caption path
    (the only TP-sharded math) is the regression signal here, the
    full-scale detection gate lives in the flagship artifact above."""
    assert os.path.exists(MESH_ARTIFACT), (
        "mesh quality trajectory artifact missing — run "
        "scripts/quality_trajectory.py --tiny --mesh 4,2 on the 8-device "
        "virtual mesh and commit the curve")
    with open(MESH_ARTIFACT) as f:
        art = json.load(f)
    assert art["config"]["mesh"] == "4,2"
    assert art["config"]["steps"] >= 150
    curve = art["curve"]
    first_loss = next(x for x in curve["loss"] if x is not None)
    assert art["final"]["loss"] <= 0.75 * first_loss, curve["loss"]
    assert curve["cap_acc"][-1] >= 0.8, curve["cap_acc"]
    assert curve["cap_loss"][-1] <= 0.6, curve["cap_loss"]


@pytest.mark.slow
def test_tiny_trajectory_runs_end_to_end(tmp_path):
    """Drives BOTH new study surfaces in one subprocess: multi-seed
    in-process batching (--seeds, per-seed JSONs) and the multi-batch
    held-out eval (--eval_batches)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out_pat = str(tmp_path / "qt_{seed}.json")
    proc = subprocess.run(
        [sys.executable, "scripts/quality_trajectory.py", "--tiny",
         "--steps", "8", "--eval_every", "8", "--batch_size", "2",
         "--num_batches", "1", "--num_points", "512",
         "--eval_batches", "2", "--seeds", "5,6", "--out", out_pat],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for seed in (5, 6):
        with open(str(tmp_path / f"qt_{seed}.json")) as f:
            out = json.load(f)
        assert out["config"]["seed"] == seed
        assert out["config"]["eval_batches"] == 2
        assert out["curve"]["step"] == [0, 8]
        assert out["final"]["loss"] is not None


def test_seeds_requires_placeholder_out():
    proc = subprocess.run(
        [sys.executable, "scripts/quality_trajectory.py", "--tiny",
         "--steps", "1", "--seeds", "1,2", "--out", "/tmp/nope.json"],
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=600)
    assert proc.returncode != 0
    assert "{seed}" in proc.stderr
