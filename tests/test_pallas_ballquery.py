"""Pallas fused dist+pack ball-query kernel parity (interpret mode on CPU)
vs the XLA bitmask pack, including the shared decode end to end.

Interpret mode cannot catch Mosaic's silent f32->bf16 MXU truncation, but
the pack matmul is DESIGNED exact under that truncation (0/1 hits, power-
of-two weights, f32 accumulation of sums < 2^16) — the on-device gate
(scripts/tpu_parity_check.py) re-verifies index parity on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan2cap_tpu.ops.grouping import _decode_first_k, ball_query
from scan2cap_tpu.ops.pallas.ballquery import ball_query_pack_pallas


def _xla_words(xyz, new_xyz, radius2):
    """Reference pack: (B, M, W) uint32 words + popcounts."""
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1)
    hit = np.asarray(d2) < radius2
    B, M, N = hit.shape
    W = -(-N // 32)
    hp = np.zeros((B, M, W * 32), bool)
    hp[..., :N] = hit
    words = np.zeros((B, M, W), np.uint32)
    for b in range(32):
        words |= hp[..., b::32].astype(np.uint32) << b
    counts = np.zeros_like(words, np.int64)
    for b in range(32):
        counts += (words >> b) & 1
    return words, counts.astype(np.int32)


@pytest.mark.parametrize("B,N,M", [(2, 4500, 96), (1, 4096, 256)])
def test_pack_matches_xla_words(rng, B, N, M):
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    q = xyz[:, :M]
    r2 = 0.2 ** 2
    words, counts = ball_query_pack_pallas(xyz, q, r2, interpret=True)
    W = -(-N // 32)
    want_w, want_c = _xla_words(xyz, q, r2)
    np.testing.assert_array_equal(np.asarray(words)[..., :W], want_w)
    np.testing.assert_array_equal(np.asarray(counts)[..., :W], want_c)
    # padded word columns beyond ceil(N/32) must be zero (decode relies
    # on trailing zeros contributing no hits)
    assert not np.asarray(words)[..., W:].any()


def test_pack_plus_decode_matches_ball_query(rng):
    B, N, M, S, R = 2, 4500, 128, 16, 0.35
    xyz = jnp.asarray((rng.rand(B, N, 3) * 2 - 1).astype(np.float32))
    q = xyz[:, :M]
    words, counts = ball_query_pack_pallas(xyz, q, R * R, interpret=True)
    W = -(-N // 32)
    got = jax.vmap(lambda w, c: _decode_first_k(w, c, S))(
        words[..., :W], counts[..., :W])
    want = ball_query(xyz, q, R, S, mode="exact")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_dense_cluster_all_ones_words(rng):
    """Every point inside the radius -> every half-word is 0xFFFF.

    Exercises the word-combine at its extremes (hi*2^16 wrapping past
    int32 max).  The round-3 hardware parity gate caught Mosaic folding
    `<<16`-after-f32->i32-cast into a float-scaled conversion that
    flushed hi half-words < 128 and corrupted >= 2^31; the kernel now
    combines with an int multiply (ops/pallas/ballquery.py).  Interpret
    mode cannot reproduce the fold, but this pins the combine SEMANTICS
    at the value range where it broke; scripts/tpu_parity_check.py runs
    the same shape on hardware.
    """
    N = 4096
    xyz = jnp.asarray((rng.rand(1, N, 3) * 0.05).astype(np.float32))
    q = xyz[:, :64]
    words, counts = ball_query_pack_pallas(xyz, q, 0.5 ** 2, interpret=True)
    W = N // 32
    np.testing.assert_array_equal(
        np.asarray(words)[..., :W], np.full((1, 64, W), 0xFFFFFFFF, np.uint32))
    np.testing.assert_array_equal(
        np.asarray(counts)[..., :W], np.full((1, 64, W), 32, np.int32))
