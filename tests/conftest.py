"""Test configuration: run everything on an 8-device virtual CPU mesh.

The reference had no test suite at all (SURVEY.md §4); here every op and
module is tested on CPU, and multi-chip sharding tests use the virtual
device mesh — set up before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override e.g. JAX_PLATFORMS=axon
# no network in CI: make transformers/huggingface probes fail fast instead
# of waiting out connection timeouts (twod/preprocessing falls back)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end pipeline tests")


# The env var alone is not enough when a TPU plugin (axon) is present —
# force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall clock is dominated by XLA
# CPU compiles of the full-model programs; cached compiles make re-runs
# (and the driver's repeated verification passes) several times faster.
# A COLD cache (fresh clone / CI) pays ~7.4 min of compiles on this host, so
# a seed tarball is checked in (tests/fixtures/compile_cache_seed.tar.gz,
# rebuilt by scripts/build_test_cache_seed.py) and extracted on first run;
# entries whose keys don't match this jax/XLA build are simply misses.
# honor an explicit env override (scripts/build_test_cache_seed.py points a
# rebuild at a temp dir this way; jax.config.update below would otherwise
# silently win over the env var)
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
    os.path.expanduser("~"), ".cache", "scan2cap_tpu_jax_testcache")
_seed_tar = os.path.join(
    os.path.dirname(__file__), "fixtures", "compile_cache_seed.tar.gz")
if os.environ.get("SCAN2CAP_NO_CACHE_SEED"):
    _seed_tar = ""  # seed-rebuild runs must start truly cold
# Seed extraction failures (old tarfile without the filter= backport, a
# truncated tarball, ...) must NOT take down the persistent cache itself —
# a cold cache is slow, no cache at all is slower still, so the two setup
# steps get separate failure domains.
try:
    if not os.path.isdir(_cache_dir) or not os.listdir(_cache_dir):
        os.makedirs(_cache_dir, exist_ok=True)
        if _seed_tar and os.path.exists(_seed_tar):
            import sys
            import tarfile

            try:
                with tarfile.open(_seed_tar) as tf:
                    tf.extractall(_cache_dir, filter="data")
            except Exception as e:  # run cold, but SAY so and stay seedable
                print(f"conftest: compile-cache seed extraction failed "
                      f"({e!r}); running with a cold cache", file=sys.stderr)
                for _f in os.listdir(_cache_dir):
                    try:
                        os.remove(os.path.join(_cache_dir, _f))
                    except OSError:
                        pass
except Exception:
    pass
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0.35s threshold (vs the jax default 1.0): the suite compiles hundreds
    # of distinct sub-2s programs whose sum is minutes; persist them too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.35)
    # CLI end-to-end tests spawn `python scripts/...` subprocesses, which
    # would otherwise recompile every program on every suite run — the env
    # vars hand them the same cache (jax reads these at startup)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.35")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
