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
    """The floors digest (VERDICT r2 item 9, harness reconciled r4 per
    VERDICT r3 item 4) must carry measured + floor ms, the measured/floor
    ratio, a basis string per op, and the subtracted dispatch overhead;
    exercised at toy shapes on CPU (where overhead can exceed the op cost,
    so measured_ms may legitimately clamp to 0)."""
    floors = bench_mod.measure_floors(
        B=2, N=512, M=64, S=8, REP=2, train_step_ms=100.0,
        det_train_ms=80.0,
        model_passes={"det_eval_ms": 50.0, "backbone_eval_ms": 40.0,
                      "backbone_train_ms": 60.0})
    assert floors["dispatch_overhead_ms"] >= 0
    assert floors["rep"] == 2
    for op in ("fps", "ball_query", "sa1_gather", "sa1_dw_gather",
               "mlp_bn_eval", "mlp_bn_train"):
        assert floors[op]["measured_ms"] >= 0
        assert "floor_ms" in floors[op]
        if floors[op]["floor_ms"] > 0:
            # ratio is computed pre-rounding; compare with slack for the
            # 2-decimal rounding of measured/floor at toy shapes
            assert floors[op]["ratio"] == pytest.approx(
                floors[op]["measured_ms"] / floors[op]["floor_ms"],
                rel=0.02, abs=0.01)
        else:  # toy shapes can round the slice-count floor to 0.0
            assert floors[op]["ratio"] is None
        assert floors[op]["floor_basis"]
    # measured-only entries (no floor, ratio None by construction)
    for op in ("fp_chain_eval", "fp_chain_train", "bq_sa2_4"):
        assert floors[op]["measured_ms"] >= 0
        assert floors[op]["floor_ms"] is None
        assert floors[op]["ratio"] is None
    # the HBM stream denominator + step-coverage block (VERDICT r4 #4)
    assert floors["hbm"]["stream_mb_per_rep"] > 0
    acc = floors["accounted"]
    assert acc["train_step"]["step_ms"] == 100.0
    assert acc["train_step"]["coverage"] == pytest.approx(
        acc["train_step"]["sum_ms"] / 100.0, abs=0.01)
    assert acc["eval_detection"]["sum_ms"] >= 0
    # the model-pass ladder deltas: det-train minus backbone-train and
    # det-eval minus backbone-eval, plus live eval denominator + backbone
    # sub-coverage
    assert acc["train_step"][
        "voting_proposal_losses_adam_delta_ms"] == pytest.approx(20.0)
    assert acc["train_step"]["backbone_step_ms"] == 60.0
    assert acc["train_step"]["backbone_coverage"] == pytest.approx(
        acc["train_step"]["backbone_components_ms"] / 60.0, abs=0.01)
    ev = acc["eval_detection"]
    assert ev["voting_proposal_delta_ms"] == pytest.approx(10.0)
    assert ev["step_ms_measured"] == 50.0
    assert ev["coverage"] == pytest.approx(ev["sum_ms"] / 50.0, abs=0.01)
    # without the ladder the toy-shape eval coverage must stay None (the
    # 87 ms reference is only valid at the default flagship shape)
    floors_min = bench_mod.measure_floors(B=2, N=512, M=64, S=8, REP=2)
    assert floors_min["accounted"]["eval_detection"]["coverage"] is None
    assert floors_min["accounted"]["train_step"][
        "voting_proposal_losses_adam_delta_ms"] is None


def test_measure_model_passes_smoke(bench_mod):
    """The model-pass ladder (live detection-eval denominator + backbone
    eval/train passes) must build and run at toy shapes on CPU — this is
    the compile-surface guard for the TPU run."""
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.data.synthetic import make_vocab

    cfg = ModelConfig(num_points=512, num_proposals=16,
                      sa_npoints=(128, 64, 32, 16), max_num_obj=8,
                      num_locals=4)
    vocab = make_vocab(num_vocabs=bench_mod.NUM_VOCABS,
                       emb_size=cfg.emb_size)
    mp = bench_mod.measure_model_passes(cfg, vocab, REP=2, B=2)
    assert set(mp) == {"det_eval_ms", "backbone_eval_ms",
                       "backbone_train_ms"}
    assert all(v >= 0 for v in mp.values())


class _FakeResult:
    def __init__(self, rc, out="", err=""):
        self.returncode = rc
        self.stdout = out
        self.stderr = err


def _drive_watchdog(bench_mod, monkeypatch, capsys, script):
    """Run _watchdog_main with a scripted subprocess.run; returns
    (exit_code, stdout_lines).  ``script`` is an iterable of _FakeResult
    (or 'timeout') consumed in call order.  Virtual time advances 20 s per
    time() call so deadline logic runs without wall-clock waits."""
    import subprocess as sp

    calls = iter(script)

    def fake_run(cmd, **kw):
        item = next(calls)
        if item == "timeout":
            raise sp.TimeoutExpired(cmd, kw.get("timeout", 0))
        return item

    clock = {"t": 1000.0}

    def fake_time():
        clock["t"] += 20.0
        return clock["t"]

    monkeypatch.setattr(sp, "run", fake_run)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench_mod.time, "time", fake_time)
    monkeypatch.setenv("SCAN2CAP_BENCH_DEADLINE_S", "2400")
    try:
        with pytest.raises(SystemExit) as ex:
            bench_mod._watchdog_main()
        out = capsys.readouterr().out.strip().splitlines()
        return ex.value.code, out
    finally:
        monkeypatch.undo()


GOOD_PROBE = _FakeResult(0, "probe-ok 2016.0\n")
GOOD_BENCH = _FakeResult(
    0, 'noise\n{"metric": "eval_scenes_per_sec_chip", "value": 158.2}\n')


def test_watchdog_retries_failed_probe_then_succeeds(
        bench_mod, monkeypatch, capsys):
    """BENCH_r02's exact scenario: backend init fails (probe crash), then
    the tunnel self-recovers — the watchdog must retry inside the deadline
    and pass the child's JSON line through."""
    code, out = _drive_watchdog(bench_mod, monkeypatch, capsys, [
        _FakeResult(1, "", "UNAVAILABLE: TPU backend setup/compile error"),
        "timeout",                       # probe attempt 2 hangs
        GOOD_PROBE, GOOD_BENCH,          # attempt 3 recovers
    ])
    assert code == 0
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 158.2


def test_watchdog_retries_bench_crash(bench_mod, monkeypatch, capsys):
    """A probe-green but crashing measurement child must be retried, not
    surfaced as a raw traceback."""
    code, out = _drive_watchdog(bench_mod, monkeypatch, capsys, [
        GOOD_PROBE, _FakeResult(1, "", "Traceback ... boom"),
        GOOD_PROBE, GOOD_BENCH,
    ])
    assert code == 0
    assert json.loads(out[-1])["value"] == 158.2


def test_watchdog_bench_rc0_without_json_is_a_failure(
        bench_mod, monkeypatch, capsys):
    """rc=0 with no parseable line must not be trusted: retried, and the
    final give-up is one labeled JSON error line."""
    import itertools
    script = itertools.cycle([GOOD_PROBE, _FakeResult(0, "no json here")])
    code, out = _drive_watchdog(bench_mod, monkeypatch, capsys, script)
    assert code == 1
    obj = json.loads(out[-1])
    assert obj["value"] is None
    assert "gave up" in obj["error"]


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
