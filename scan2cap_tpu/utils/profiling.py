"""Tracing / profiling + numerics guards.

The reference's observability is wall-clock prints with
CUDA_LAUNCH_BLOCKING=1 forced at every entry point (SURVEY.md §5.1-2 —
synchronous launches, no profiler).  TPU-native replacements:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  TensorBoard-viewable device traces (op-level timing on the real chip);
* ``annotate(name)`` — named trace spans for the solver's fetch/step phases;
* ``StepTimer`` — the solver's per-phase wall-clock aggregation
  (fetch/forward+backward), mirroring lib/solver.py:404-446;
* ``check_finite(tree)`` — NaN/Inf guard over a pytree (XLA is deterministic,
  so a single check per val-step replaces the reference's per-kernel
  CUDA_CHECK_ERRORS).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates named phase durations; reports means."""

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def mean(self, name: str, last: Optional[int] = None) -> float:
        xs = self.times[name]
        if not xs:
            return 0.0
        return float(np.mean(xs[-last:] if last else xs))

    def report(self, last: Optional[int] = None) -> Dict[str, float]:
        return {k: self.mean(k, last) for k in self.times}


def check_finite(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (host-side, call sparingly)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
