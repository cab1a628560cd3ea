"""Parity tests for ball query / grouping vs the CUDA semantics
(ball_query_gpu.cu:9-54, group_points_gpu.cu:8-75)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.ops import ball_query, group_points, query_and_group


def ball_query_numpy(xyz, new_xyz, radius, nsample):
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius ** 2
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = ((new_xyz[b, j] - xyz[b, k]) ** 2).sum()
                if d2 < r2:
                    if cnt == 0:
                        out[b, j, :] = k
                    out[b, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def test_ball_query_matches_numpy(rng):
    xyz = rng.rand(2, 120, 3).astype(np.float32)
    new_xyz = xyz[:, :20]
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 8))
    want = ball_query_numpy(xyz, new_xyz, 0.2, 8)
    np.testing.assert_array_equal(got, want)


def test_ball_query_pads_with_first_hit(rng):
    # a center whose ball contains exactly one point -> all slots repeat it
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :, 0] = np.arange(10) * 10.0
    new_xyz = xyz[:, 3:4]
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.5, 4))
    np.testing.assert_array_equal(got[0, 0], [3, 3, 3, 3])


def test_ball_query_no_hit_returns_zero():
    xyz = np.ones((1, 5, 3), np.float32) * 100.0
    new_xyz = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.1, 3))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_chunked_matches_unchunked(rng):
    xyz = rng.rand(1, 300, 3).astype(np.float32)
    new_xyz = rng.rand(1, 70, 3).astype(np.float32)
    a = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.3, 6, chunk=16))
    b = ball_query_numpy(xyz, new_xyz, 0.3, 6)
    np.testing.assert_array_equal(a, b)


def ball_query_numpy_fast(xyz, new_xyz, radius, nsample):
    """Vectorized golden (same semantics as ball_query_numpy) for large N."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius ** 2
    for b in range(B):
        d2 = ((new_xyz[b][:, None, :] - xyz[b][None, :, :]) ** 2).sum(-1)
        for j in range(M):
            hits = np.nonzero(d2[j] < r2)[0]
            if hits.size == 0:
                continue
            k = min(hits.size, nsample)
            out[b, j, :] = hits[0]
            out[b, j, :k] = hits[:k]
    return out


def test_ball_query_two_level_decode(rng):
    # N > 4096 routes through the two-level block decode (W > 128); include
    # dense and sparse regions so blocks straddle hits, padding, and no-hits.
    N = 9000
    xyz = rng.rand(2, N, 3).astype(np.float32) * 4.0
    xyz[0, 5000:5200] = xyz[0, 100]            # dense cluster (> nsample hits)
    xyz[1, 0] = 50.0                           # isolated: query 0 has no hits
    new_xyz = np.ascontiguousarray(xyz[:, :40])
    for radius, nsample in ((0.25, 16), (0.8, 64)):
        got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                    radius, nsample))
        want = ball_query_numpy_fast(xyz, new_xyz, radius, nsample)
        np.testing.assert_array_equal(got, want)


def test_group_points_and_grad(rng):
    feats = rng.randn(2, 30, 5).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 4, 3)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
    want = np.stack([feats[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)

    def f(x):
        return (group_points(x, jnp.asarray(idx)) ** 2).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    want_g = np.zeros_like(feats)
    for b in range(2):
        for m in range(4):
            for s in range(3):
                want_g[b, idx[b, m, s]] += 2 * feats[b, idx[b, m, s]]
    np.testing.assert_allclose(g, want_g, rtol=1e-5)


def test_query_and_group_normalize(rng):
    xyz = rng.rand(1, 60, 3).astype(np.float32)
    new_xyz = xyz[:, :5]
    feats = rng.randn(1, 60, 4).astype(np.float32)
    out, grouped_xyz = query_and_group(
        jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats),
        radius=0.4, nsample=6, use_xyz=True, normalize_xyz=True,
        ret_grouped_xyz=True)
    assert out.shape == (1, 5, 6, 7)
    idx = ball_query_numpy(xyz, new_xyz, 0.4, 6)
    want_xyz = (xyz[0][idx[0]] - new_xyz[0][:, None, :]) / 0.4
    np.testing.assert_allclose(np.asarray(grouped_xyz)[0], want_xyz, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, ..., 3:], feats[0][idx[0]], rtol=1e-5)


def test_ball_query_randomized_property(rng):
    # randomized sweep across N (stressing word/supergroup boundaries),
    # radii and nsample; exact equality with the brute-force golden
    for trial in range(12):
        N = int(rng.choice([31, 32, 33, 63, 65, 127, 128, 300, 1024,
                            4095, 4097, 5000]))
        M = int(rng.randint(1, 40))
        nsample = int(rng.choice([1, 3, 8, 32, 64, 128]))  # incl. nsample > N
        radius = float(rng.choice([0.05, 0.2, 0.5, 1.5]))
        B = int(rng.randint(1, 3))
        xyz = rng.rand(B, N, 3).astype(np.float32) * 2.0
        new_xyz = rng.rand(B, M, 3).astype(np.float32) * 2.0
        got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                    radius, nsample))
        want = ball_query_numpy_fast(xyz, new_xyz, radius, nsample)
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial={trial} N={N} M={M} "
                               f"ns={nsample} r={radius}")


def test_group_all_matches_reference_semantics():
    # pointnet2_utils.py:379-424 GroupAll: one group holding the whole cloud,
    # ABSOLUTE coordinates (no recentring), xyz channels first
    from scan2cap_tpu.ops import group_all

    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 37, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 37, 5).astype(np.float32))

    out = np.asarray(group_all(xyz, feats, use_xyz=True))
    assert out.shape == (2, 1, 37, 8)
    np.testing.assert_array_equal(out[:, 0, :, :3], np.asarray(xyz))
    np.testing.assert_array_equal(out[:, 0, :, 3:], np.asarray(feats))

    out = np.asarray(group_all(xyz, feats, use_xyz=False))
    np.testing.assert_array_equal(out[:, 0], np.asarray(feats))

    out = np.asarray(group_all(xyz, None, use_xyz=True))
    np.testing.assert_array_equal(out[:, 0], np.asarray(xyz))

    with pytest.raises(ValueError):
        group_all(xyz, None, use_xyz=False)
