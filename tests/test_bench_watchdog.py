"""Host-side tests for bench.py's watchdog plumbing (no device needed).

Round-2 VERDICT weak #1: BENCH_r02.json was a failure record because a
child crash (backend init error) produced a raw traceback and no JSON line.
These tests pin the contract that the watchdog always yields exactly one
parseable JSON object regardless of how the child dies.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
BENCH = os.path.abspath(os.path.join(REPO, "bench.py"))


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_for_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_extract_json_line_picks_last_metric_object(bench_mod):
    text = (
        "WARNING: some log noise\n"
        '{"metric": "stale", "value": 1}\n'
        "more noise {not json\n"
        '{"metric": "eval_scenes_per_sec_chip", "value": 158.2}\n'
        "trailing goodbye\n"
    )
    line = bench_mod._extract_json_line(text)
    assert json.loads(line)["value"] == 158.2


def test_extract_json_line_rejects_non_metric_json(bench_mod):
    assert bench_mod._extract_json_line('{"foo": 1}\n') is None
    assert bench_mod._extract_json_line("") is None
    assert bench_mod._extract_json_line(None) is None


def test_emit_failure_is_one_parseable_line(bench_mod, capsys):
    bench_mod._emit_failure("backend exploded: " + "x" * 5000)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert obj["value"] is None
    assert obj["metric"] == "eval_scenes_per_sec_chip"
    assert "backend exploded" in obj["error"]
    assert len(obj["error"]) <= 2000


def test_measure_floors_structure(bench_mod):
    """The floors digest (VERDICT r2 item 9) must carry measured + floor ms
    and a basis string per op; exercised at toy shapes on CPU."""
    floors = bench_mod.measure_floors(B=2, N=512, M=64, S=8, REP=2)
    for op in ("fps", "ball_query", "sa1_gather"):
        assert floors[op]["measured_ms"] > 0
        assert "floor_ms" in floors[op]
        assert floors[op]["floor_basis"]


def test_watchdog_emits_labeled_json_when_budget_too_small():
    """With a deadline below the minimum attempt budget, the watchdog must
    still print one labeled JSON failure line and exit nonzero — the exact
    BENCH_r02 contract (driver always parses *something*)."""
    env = dict(os.environ, SCAN2CAP_BENCH_DEADLINE_S="1",
               JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, BENCH], env=env,
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 1
    lines = [l for l in res.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert obj["value"] is None
    assert "gave up" in obj["error"]
