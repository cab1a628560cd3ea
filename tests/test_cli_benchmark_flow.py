"""Full offline workflow on fixture data: train -> benchmark/predict.py ->
scripts/build_benchmark_gt.py -> benchmark/eval.py — the reference's
README.md:150-176 path end to end, on CPU."""

import json
import os
import subprocess
import sys

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
    return env


@pytest.mark.slow
def test_full_benchmark_flow(cli_data):
    env = _env(cli_data)
    # 1. train one tiny epoch
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "--epoch", "1", "--batch_size", "2", "--num_points", "512",
         "--num_proposals", "16", "--verbose", "1", "--val_step", "100",
         "--use_topdown", "--num_locals", "4", "--tag", "benchflow"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    run = next((cli_data / "outputs").iterdir()).name

    # 2. predict on the val split (scene ids end with _00 -> all kept)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmark", "predict.py"),
         "--folder", run, "--split", "val", "--batch_size", "2"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    pred_path = cli_data / "outputs" / run / "pred.json"
    assert pred_path.exists()
    preds = json.loads(pred_path.read_text())
    assert "scene0001_00" in preds

    # 3. build the benchmark GT boxes
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_benchmark_gt.py"),
         "--split", "val", "--data", str(cli_data / "data")],
        env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-3000:]
    gt_path = cli_data / "data" / "ScanRefer_filtered_val_gt_bbox.json"
    assert gt_path.exists()

    # 4. offline evaluation
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmark", "eval.py"),
         "--path", str(pred_path), "--gt_path", str(gt_path)],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    results_path = cli_data / "outputs" / run / "eval_results.json"
    assert results_path.exists()
    results = json.loads(results_path.read_text())
    assert "captioning" in results and "detection" in results \
        and "densecap" in results
    # sane structure: caption metrics at all three IoU gates
    for gate in ("0", "0.25", "0.5"):
        assert gate in results["captioning"]
        assert "f1-score" in results["captioning"][gate]

    # 4b. the in-repo eval CLI (reference scripts/eval.py): caption metrics
    #     + detection mAP on the val split
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval.py"),
         "--folder", run, "--batch_size", "2", "--min_iou", "0.0",
         "--eval_caption", "--eval_detection", "--save_interm"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "CIDEr" in res.stdout and "mAP" in res.stdout, res.stdout[-2000:]
    # --save_interm wrote the reference-style per-object dump with the
    # local-slot attention context (lib/eval_helper.py:242-275)
    interm = json.loads(
        (cli_data / "outputs" / run / "interm.json").read_text())
    assert interm, "no intermediates recorded"
    obj = next(iter(next(iter(interm.values())).values()))
    assert {"object_name", "box_corner", "description", "token"} <= set(obj)
    # topdown decoder with num_locals: attention context must be present
    assert "object_attn_weight" in obj, obj.keys()
    L = len(obj["object_attn_slots"])
    assert len(obj["object_attn_weight"][0]) == L
    assert len(obj["object_attn_context"]) == L
    assert abs(sum(obj["object_attn_weight"][0]) - 1.0) < 1e-3

    # 5. visualization CLI: scene cloud + pred/GT box PLYs + captions json
    #    (reference scripts/visualize.py)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "visualize.py"),
         "--folder", run, "--scene_id", "scene0001_00"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    vis_dir = cli_data / "outputs" / run / "vis" / "scene0001_00"
    assert vis_dir.exists(), list((cli_data / "outputs" / run).iterdir())
    names = {p.name for p in vis_dir.iterdir()}
    # pred_boxes.ply only appears when a proposal survives NMS∧objectness
    assert {"scene.ply", "gt_boxes.ply", "captions.json"} <= names, names
    # per-object GT box PLYs colored by the NYU40 palette
    # (reference scripts/visualize.py:393-401 + scripts/colors.py)
    assert any(n.startswith("gt-") and n.endswith(".ply")
               for n in names), names
