"""Parity tests for FPS / gather vs a numpy re-implementation of the CUDA
semantics (sampling_gpu.cu:69-173): seed index 0, ||p||^2<=1e-3 skip,
running-min update, first-index argmax ties."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.ops import furthest_point_sample, gather_points


def fps_numpy(xyz, npoint):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        pts = xyz[b]
        valid = (pts ** 2).sum(-1) > 1e-3
        temp = np.full(N, 1e10, dtype=np.float32)
        old = 0
        for j in range(1, npoint):
            d = ((pts - pts[old]) ** 2).sum(-1).astype(np.float32)
            temp = np.minimum(temp, d)
            score = np.where(valid, temp, -1.0)
            old = int(np.argmax(score))
            out[b, j] = old
    return out


def test_fps_matches_numpy(rng):
    xyz = rng.randn(3, 200, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
    want = fps_numpy(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_skips_near_origin_padding(rng):
    # pad half the cloud with zeros — they must never be selected
    xyz = rng.randn(2, 100, 3).astype(np.float32) + 5.0
    xyz[:, 50:] = 0.0
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 40))
    assert got.max() < 50
    want = fps_numpy(xyz, 40)
    np.testing.assert_array_equal(got, want)


def test_fps_seed_is_zero(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
    assert (got[:, 0] == 0).all()


def test_gather_points(rng):
    feats = rng.randn(2, 50, 7).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 9)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    want = np.stack([feats[b, idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_gather_points_grad_is_scatter_add(rng):
    feats = rng.randn(1, 10, 4).astype(np.float32)
    idx = np.array([[3, 3, 5]], dtype=np.int32)  # duplicate index

    def f(x):
        return gather_points(x, jnp.asarray(idx)).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    want = np.zeros_like(feats)
    want[0, 3] = 2.0  # accumulated twice
    want[0, 5] = 1.0
    np.testing.assert_allclose(g, want)


def test_fps_randomized_property(rng):
    from scan2cap_tpu.ops.sampling import furthest_point_sample

    for trial in range(8):
        N = int(rng.choice([8, 33, 100, 257, 1000]))
        npoint = int(rng.randint(1, min(N, 64) + 1))
        B = int(rng.randint(1, 3))
        xyz = (rng.rand(B, N, 3).astype(np.float32) * 4 - 2)
        if trial % 2:                       # sprinkle near-origin padding
            k = rng.randint(0, N // 2 + 1)
            xyz[:, rng.choice(N, k, replace=False)] = 0.0
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), npoint))
        want = fps_numpy(xyz, npoint)
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial={trial} N={N} npoint={npoint}")


def test_fps_implementation_toggle(rng):
    # export-safe "xla" mode must route around the Pallas kernel and give
    # identical indices (multi-platform jax.export can't lower Pallas on cpu)
    from scan2cap_tpu.ops import sampling

    xyz = jnp.asarray(rng.rand(2, 600, 3).astype(np.float32))
    base = np.asarray(sampling.furthest_point_sample(xyz, 32))
    sampling.set_fps_implementation("xla")
    try:
        assert sampling.FORCE_XLA_FPS
        forced = np.asarray(sampling.furthest_point_sample(xyz, 32))
    finally:
        sampling.set_fps_implementation("auto")
    assert not sampling.FORCE_XLA_FPS
    np.testing.assert_array_equal(base, forced)
