"""Unit test for scripts/analyze_quality_study.py (TPU_DESIGN §8 v2 study).

Synthesizes paired qt_seed*_{f32,bf16s}.json curves and checks the tail
means, paired deltas, and each branch of the pre-registered decision rule
— the tool gates a default-dtype decision, so its arithmetic must not
drift silently.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "analyze_quality_study.py")


def _write_run(dirpath, seed, arm, map25_tail, cap_acc_final=1.0):
    steps = list(range(0, 650, 50))
    n = len(steps)
    curve = {
        "step": steps,
        "loss": [None] + [10.0] * (n - 1),
        "cap_loss": [None] + [0.1] * (n - 1),
        "cap_acc": [None] + [cap_acc_final] * (n - 1),
        # below-tail points differ so the tail_from filter is observable
        "map25": [0.0] * (n - 4) + [map25_tail] * 4,  # steps 450..600
        "ar25": [0.5] * n,
        "cider_train": [1.0] * n,
    }
    data = {"config": {"seed": seed}, "curve": curve,
            "final": {"map25": curve["map25"][-1]}}
    with open(os.path.join(dirpath, f"qt_seed{seed}_{arm}.json"), "w") as f:
        json.dump(data, f)


def _run(dirpath):
    r = subprocess.run([sys.executable, SCRIPT, "--dir", str(dirpath)],
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    with open(os.path.join(dirpath, "paired_summary.json")) as f:
        return json.load(f), r.stdout


def test_neutral_study_flips_default(tmp_path):
    d = str(tmp_path)
    # 4 seeds, deltas +0.01, -0.01, +0.02, -0.005 -> mean > -0.02, 2 favor
    pairs = [(1, 0.40, 0.41), (2, 0.42, 0.41), (3, 0.38, 0.40),
             (4, 0.40, 0.395)]
    for seed, f32, bf in pairs:
        _write_run(d, seed, "f32", f32)
        _write_run(d, seed, "bf16s", bf)
    summary, _ = _run(d)
    assert summary["seeds"] == [1, 2, 3, 4]
    mean = summary["delta_map25"]["mean"]
    assert abs(mean - 0.00375) < 1e-9
    assert summary["delta_map25"]["favoring"] == 2
    assert summary["rule"]["mean_ok"] and not summary["rule"]["collapse"]
    assert summary["verdict"] == "STAY-OPT-IN"  # favoring 2 < 3

    # one more favorable seed crosses the favoring>=3 bar
    _write_run(d, 5, "f32", 0.40)
    _write_run(d, 5, "bf16s", 0.42)
    summary, _ = _run(d)
    assert summary["delta_map25"]["favoring"] == 3
    assert summary["verdict"] == "FLIP-DEFAULT"


def test_collapse_and_regression_stay_opt_in(tmp_path):
    d = str(tmp_path)
    # clear regression: every seed -0.1
    for seed in (1, 2, 3):
        _write_run(d, seed, "f32", 0.45)
        _write_run(d, seed, "bf16s", 0.35)
    summary, _ = _run(d)
    assert not summary["rule"]["mean_ok"]
    assert summary["verdict"] == "STAY-OPT-IN"

    # collapse guard: one seed at 0.05 vs f32 0.45 trips it even if the
    # others are neutral
    d2 = str(tmp_path / "collapse")
    os.makedirs(d2)
    _write_run(d2, 1, "f32", 0.45)
    _write_run(d2, 1, "bf16s", 0.05)
    for seed in (2, 3, 4):
        _write_run(d2, seed, "f32", 0.40)
        _write_run(d2, seed, "bf16s", 0.41)
    summary, _ = _run(d2)
    assert summary["rule"]["collapse"]
    assert summary["verdict"] == "STAY-OPT-IN"


def test_cap_acc_guard(tmp_path):
    d = str(tmp_path)
    for seed in (1, 2, 3):
        _write_run(d, seed, "f32", 0.40)
        _write_run(d, seed, "bf16s", 0.41, cap_acc_final=0.5)
    summary, _ = _run(d)
    assert not summary["rule"]["cap_acc_ok"]
    assert summary["verdict"] == "STAY-OPT-IN"
