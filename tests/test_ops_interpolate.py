"""Parity tests for three_nn / three_interpolate (interpolate_gpu.cu:9-154)."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.ops import three_nn, three_interpolate
from scan2cap_tpu.ops.interpolate import interpolation_weights


def three_nn_numpy(unknown, known):
    B, n, _ = unknown.shape
    dist = np.zeros((B, n, 3), np.float32)
    idx = np.zeros((B, n, 3), np.int32)
    for b in range(B):
        d2 = ((unknown[b][:, None, :] - known[b][None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        idx[b] = order
        dist[b] = np.sqrt(np.take_along_axis(d2, order, axis=-1))
    return dist, idx


def test_three_nn(rng):
    unknown = rng.rand(2, 40, 3).astype(np.float32)
    known = rng.rand(2, 15, 3).astype(np.float32)
    d, i = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dw, iw = three_nn_numpy(unknown, known)
    np.testing.assert_array_equal(np.asarray(i), iw)
    np.testing.assert_allclose(np.asarray(d), dw, atol=1e-5)


def test_three_interpolate_and_grad(rng):
    feats = rng.randn(2, 15, 6).astype(np.float32)
    idx = rng.randint(0, 15, size=(2, 9, 3)).astype(np.int32)
    w = rng.rand(2, 9, 3).astype(np.float32)
    got = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want = np.einsum("bnkc,bnk->bnc",
                     np.stack([feats[b][idx[b]] for b in range(2)]), w)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # gradient wrt features is a scatter-add of weighted grads
    def f(x):
        return (three_interpolate(x, jnp.asarray(idx), jnp.asarray(w))).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    want_g = np.zeros_like(feats)
    for b in range(2):
        for n in range(9):
            for k in range(3):
                want_g[b, idx[b, n, k]] += w[b, n, k]
    np.testing.assert_allclose(g, want_g, rtol=1e-5)


def test_interpolation_weights_normalized(rng):
    d = rng.rand(2, 7, 3).astype(np.float32)
    w = np.asarray(interpolation_weights(jnp.asarray(d)))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    recip = 1.0 / (d + 1e-8)
    np.testing.assert_allclose(w, recip / recip.sum(-1, keepdims=True), rtol=1e-5)
