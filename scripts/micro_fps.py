"""A/B the FPS kernel's tuning variants on the TPU.

All arms are the SAME kernel compiled with different static args (so all
programs share one process — no trace-time env traps), timed by in-jit
repetition at the sa1 eval shape (B=16 runs as two 8-scene programs, the
production grid).  Arms: the pre-tuning two-pass kernel, the validity
fold (§10b, default), the pair-scan argmax (§10c, default), and the
coords-through-the-scan variant (§10d, measured negative).  Parity across
every arm is asserted on device before timing; docs/TPU_DESIGN.md records
the verdicts.

Run: python scripts/micro_fps.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.ops.pallas.fps import furthest_point_sample_pallas

B, N, M = 16, 40000, 2048
REP = 8


def timed(make_fn, steps=4, overhead_s=0.0):
    """Per-rep kernel ms, NET of the host dispatch+readback overhead.

    Convention reconciliation (VERDICT r4 weak #6): bench.py's floors digest
    subtracts the ~28 ms tunnel dispatch before dividing by REP; this
    script's round-3/4 figures did NOT, so they read overhead/REP ≈ 3.5 ms
    HIGH (e.g. the pair-scan 12.15 ms quote = 8.61 ms net + 28.3/8) while
    the per-variant DELTAS were unaffected.  Both harnesses now report the
    net number; docs/TPU_DESIGN.md §10 carries the conversion."""
    fn = jax.jit(make_fn)
    float(fn(jnp.float32(0)))
    ts = []
    for s in range(steps):
        t0 = time.perf_counter()
        float(fn(jnp.float32((s + 1) * 1e-9)))
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) - overhead_s) / REP * 1e3


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    xyz = jax.block_until_ready(jax.jit(
        lambda k: jax.random.uniform(k, (B, N, 3), minval=-4.0, maxval=4.0)
    )(key))

    def rep(fold, pair=False, carry=False):
        def fn(salt):
            def step(acc, i):
                idx = furthest_point_sample_pallas(
                    xyz + (acc + salt + i) * 1e-12, M, fold_valid=fold,
                    pair_argmax=pair, carry_coords=carry)
                return jnp.float32(jnp.sum(idx % 128)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(REP, dtype=jnp.float32))
            return acc
        return fn

    # parity first (same inputs, all variants, on hardware)
    a = np.asarray(furthest_point_sample_pallas(
        xyz, M, fold_valid=True, pair_argmax=False))
    b = np.asarray(furthest_point_sample_pallas(
        xyz, M, fold_valid=False, pair_argmax=False))
    assert (a == b).all(), "fold_valid variants disagree on device!"
    c = np.asarray(furthest_point_sample_pallas(xyz, M))  # shipped default
    assert (a == c).all(), "pair_argmax variant disagrees on device!"
    d = np.asarray(furthest_point_sample_pallas(xyz, M, carry_coords=True))
    assert (a == d).all(), "carry_coords variant disagrees on device!"
    print("variant parity: exact")

    # dispatch+readback overhead of the timed call itself (a trivial jitted
    # program's wall time IS the overhead; ~28 ms over this tunnel)
    ov = timed(lambda salt: salt + 1.0) * REP * 1e-3
    print(f"dispatch overhead: {ov * 1e3:.1f} ms (subtracted)")

    t_old = timed(rep(False), overhead_s=ov)
    print(f"two-pass (pre-tuning):  {t_old:7.2f} ms")
    t_new = timed(rep(True), overhead_s=ov)
    print(f"validity-fold (tuned):  {t_new:7.2f} ms  "
          f"({(t_old / t_new - 1) * 100:+.1f}%)")
    t_pair = timed(rep(True, pair=True), overhead_s=ov)
    print(f"fold + pair-scan:       {t_pair:7.2f} ms  "
          f"({(t_new / t_pair - 1) * 100:+.1f}% vs fold)")
    t_cc = timed(rep(True, pair=True, carry=True), overhead_s=ov)
    print(f"fold + pair + coords:   {t_cc:7.2f} ms  "
          f"({(t_pair / t_cc - 1) * 100:+.1f}% vs pair-scan)")


if __name__ == "__main__":
    main()
