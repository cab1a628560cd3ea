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
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
