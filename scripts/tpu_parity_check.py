"""One-shot ON-DEVICE parity gate for the TPU kernels and hot ops.

The CPU test suite proves the algorithms; this script proves the HARDWARE
lowering — Mosaic silently runs f32 MXU matmuls as bf16 passes (flips
argmax ties) and has layout rules interpret mode cannot model, so every
Pallas kernel and precision-sensitive op must be checked on the real chip
(CLAUDE.md "MEASUREMENT").  Run it after touching ops/ or upgrading
jax/libtpu:

    python scripts/tpu_parity_check.py          # ~2-4 min incl. compiles

Checks (all exact, vs numpy goldens computed on host; the FPS/bq goldens
replay the semantics in f64 — the CPU suite's f32 goldens in
tests/test_ops_*.py are the canonical copies, and both agree at these
seeds/shapes):
  1. Pallas FPS == CUDA-semantics golden (seed 0, ||p||^2<=1e-3 skip,
     lowest-index ties) at sa1 and vote-aggregation shapes + odd sizes.
  2. Exact ball query == first-k-in-scan-order golden at sa1/sa2 shapes
     (both the supergroup W>128 and one-level decode branches).
  3. three_nn tie semantics at a shape with duplicated points.
  4. Eval-decode argmax chain: greedy tokens from the local-slot decoder
     match a float64 numpy replay of the same parameters (ties excluded by
     construction — random weights).  Guards the f32 classifier matmul
     precision on the MXU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp


def golden_fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        valid = (xyz[b] ** 2).sum(-1) > 1e-3
        temp = np.full(N, 1e10, np.float64)
        last = 0
        for j in range(1, npoint):
            d2 = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            temp = np.minimum(temp, d2)
            score = np.where(valid, temp, -1.0)
            last = int(np.argmax(score))   # np.argmax takes the lowest tie
            out[b, j] = last
    return out


def golden_bq(xyz, new_xyz, r, ns):
    B, M, _ = new_xyz.shape
    out = np.zeros((B, M, ns), np.int32)
    for b in range(B):
        for m in range(M):
            d2 = ((xyz[b] - new_xyz[b, m]) ** 2).sum(-1)
            hits = np.nonzero(d2 < r * r)[0]
            if len(hits) == 0:
                continue
            k = hits[:ns]
            row = np.full(ns, k[0], np.int32)
            row[:len(k)] = k
            out[b, m] = row
    return out


def check_fps():
    from scan2cap_tpu.ops.sampling import furthest_point_sample
    rng = np.random.RandomState(0)
    for B, N, npoint in ((8, 40000, 2048), (4, 1024, 256), (3, 777, 129)):
        xyz = (rng.rand(B, N, 3).astype(np.float32) * 4 - 2)
        xyz[:, 5] = 0.0                      # exercise the ||p||^2 skip
        # f32 distance ties are possible in random data but astronomically
        # unlikely; the golden replays the same f32 arithmetic in f64 on a
        # grid-free cloud
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), npoint))
        want = golden_fps(xyz.astype(np.float64), npoint)
        assert np.array_equal(got, want), \
            f"FPS mismatch at {(B, N, npoint)}: {np.sum(got != want)} cells"
        print(f"  fps {B}x{N}->{npoint}: exact")


def check_bq():
    from scan2cap_tpu.ops import ball_query
    rng = np.random.RandomState(1)
    for B, N, M, ns, r in ((2, 40000, 512, 64, 0.2),   # supergroup branch
                           (2, 2048, 256, 32, 0.4)):   # one-level branch
        xyz = (rng.rand(B, N, 3).astype(np.float32) * 2 - 1)
        new_xyz = xyz[:, :M] + rng.randn(B, M, 3).astype(np.float32) * 0.01
        got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                    r, ns))
        want = golden_bq(xyz, new_xyz, r, ns)
        assert np.array_equal(got, want), \
            f"ball_query mismatch at {(B, N, M, ns)}"
        print(f"  ball_query {B}x{N} M={M}: exact")
        if N >= 4096:
            # Pallas fused dist+pack path (MXU pack designed exact under
            # Mosaic's bf16 truncation — this is where that design claim
            # is checked on hardware)
            got_p = np.asarray(ball_query(
                jnp.asarray(xyz), jnp.asarray(new_xyz), r, ns,
                pack="pallas"))
            assert np.array_equal(got_p, want), \
                f"pallas-pack ball_query mismatch at {(B, N, M, ns)}"
            print(f"  ball_query {B}x{N} M={M}: exact (pallas pack)")
    # Dense-cluster pallas-pack case: every point inside the radius, so
    # every packed half-word is 0xFFFF — exercises the hi*2^16 >= 2^31
    # range of the word combine that the round-3 Mosaic cvt+shift fold
    # corrupted (TPU_DESIGN §10; the random case above exercises the
    # flush-below-2^23 range via mostly single-bit half-words).
    rng = np.random.RandomState(3)
    xyz = rng.rand(1, 8192, 3).astype(np.float32) * 0.05
    new_xyz = xyz[:, :128].copy()
    got_p = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                  0.5, 32, pack="pallas"))
    want = golden_bq(xyz, new_xyz, 0.5, 32)
    assert np.array_equal(got_p, want), "pallas-pack dense-cluster mismatch"
    print("  ball_query dense-cluster 1x8192 (all-ones words): exact "
          "(pallas pack)")


def check_three_nn():
    # random data has f32 NEAR-ties whose ranking legitimately differs at
    # last-ulp between numpy's and XLA's arithmetic order, so the check is:
    # the selected distances match the true 3 smallest (rel 1e-5), and an
    # EXACT duplicate resolves to the lower index (the CUDA scan order)
    from scan2cap_tpu.ops import three_nn
    rng = np.random.RandomState(2)
    unknown = rng.rand(2, 300, 3).astype(np.float32)
    known = rng.rand(2, 64, 3).astype(np.float32)
    known[:, 10] = known[:, 3]               # exact duplicate -> tie
    unknown[:, 0] = known[:, 3]              # query ON the duplicate pair
    d, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d, idx = np.asarray(d), np.asarray(idx)
    d2 = ((unknown[:, :, None].astype(np.float64)
           - known[:, None].astype(np.float64)) ** 2).sum(-1)
    for b in range(2):
        # both zero-distance duplicates must be returned, lower index first
        assert idx[b, 0, 0] == 3 and idx[b, 0, 1] == 10, \
            ("duplicate pair must fill slots 0,1 in scan order", idx[b, 0])
        for n in range(300):
            best3 = np.sort(d2[b, n])[:3]
            got3 = np.sort(d2[b, n][idx[b, n]])
            np.testing.assert_allclose(got3, best3, rtol=1e-5, atol=1e-10,
                                       err_msg=f"{b},{n}")
    print("  three_nn: 3 smallest distances + duplicate scan-order tie ok")


def check_eval_decode():
    # token-level parity of the decode chain vs the numpy replay of the
    # reference equations — the same assertions the CPU suite runs, but
    # here the MXU matmuls and argmax ties are under test
    from tests.test_caption_numpy_parity import (
        test_topdown_eval_scene_decode_matches_reference_equations,
        test_topdown_eval_local_slot_decode_matches_reference_equations,
    )
    test_topdown_eval_scene_decode_matches_reference_equations(
        np.random.RandomState(5))
    test_topdown_eval_local_slot_decode_matches_reference_equations(
        np.random.RandomState(6))
    print("  eval decode tokens: exact (full-K and local-slot paths)")


def main():
    print(f"devices: {jax.devices()}")
    check_fps()
    check_bq()
    check_three_nn()
    check_eval_decode()
    print("ALL ON-DEVICE PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
