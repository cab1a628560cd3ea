"""Opt-in wrapper that runs the on-device parity gate through pytest.

The CPU suite cannot see TPU lowering behavior (Mosaic bf16 truncation,
XLA's bf16-pass default dot precision — both have produced real bugs,
docs/TPU_DESIGN.md §5), so scripts/tpu_parity_check.py must run on real
hardware.  Skipped unless explicitly requested:

    SCAN2CAP_RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -q
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(not os.environ.get("SCAN2CAP_RUN_TPU_TESTS"),
                    reason="needs real TPU; set SCAN2CAP_RUN_TPU_TESTS=1")
def test_on_device_parity_gate():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_parity_check.py")],
        env=env, capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    assert "ALL ON-DEVICE PARITY CHECKS PASSED" in res.stdout
