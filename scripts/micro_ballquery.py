"""Microbenchmark the sa1 ball-query hot path on the TPU.

Phases:
  dist_count  - distance matrix + hit mask + per-row count reduce (no firstk)
  exact       - the current exact ball query (sort-free bitmask+popcount
                first-k decode; see ops/grouping.py)
  approx      - lax.approx_min_k variant
  l1_topk     - the REPLACED algorithm's level-1 blockwise top_k on a
                precomputed key matrix, kept only for comparison

NOTE: single-dispatch timings here include ~27 ms of tunnel dispatch +
readback overhead; for honest kernel times repeat in one jit and divide.

Run: PYTHONPATH=/root/.axon_site:. python scripts/micro_ballquery.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.ops import grouping

B, N, M, NS, R = 8, 40000, 2048, 64, 0.2


def timed(fn, *args, steps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force full completion through scalar readback
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]).astype(jnp.float32))
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0]).astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def make_scene(key):
    kx, kq = jax.random.split(key)
    xyz = jax.random.uniform(kx, (B, N, 3), minval=-4.0, maxval=4.0)
    # query centers = subset of points (like FPS output)
    new_xyz = xyz[:, :M]
    return xyz, new_xyz


@jax.jit
def dist_count(xyz, new_xyz):
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    hit = d2 < R * R
    return jnp.sum(hit, axis=-1)


@functools.partial(jax.jit, static_argnames=("block",))
def l1_topk(key_mat, block=512):
    # key_mat: (B, M, N) int32; level-1 blockwise top-64 only
    Bm, Mm, Nn = key_mat.shape
    pad = (-Nn) % block
    k = jnp.pad(key_mat, ((0, 0), (0, 0), (0, pad)), constant_values=2 * N)
    nb = (Nn + pad) // block
    k = k.reshape(Bm, Mm, nb, block)
    neg, _ = jax.lax.top_k(-k, NS)
    return -neg


@jax.jit
def make_key(xyz, new_xyz):
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    hit = d2 < R * R
    order = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    return jnp.where(hit, order, order + N)


def main():
    print("devices:", jax.devices())
    xyz, new_xyz = make_scene(jax.random.PRNGKey(0))
    jax.block_until_ready(xyz)

    t = timed(dist_count, xyz, new_xyz)
    print(f"dist+count only:      {t*1e3:8.1f} ms")

    exact = functools.partial(grouping.ball_query, radius=R, nsample=NS,
                              mode="exact")
    t = timed(exact, xyz, new_xyz)
    print(f"exact ball query:     {t*1e3:8.1f} ms")

    approx = functools.partial(grouping.ball_query, radius=R, nsample=NS,
                               mode="approx")
    t = timed(approx, xyz, new_xyz)
    print(f"approx ball query:    {t*1e3:8.1f} ms")

    key_mat = jax.jit(make_key)(xyz, new_xyz)
    jax.block_until_ready(key_mat)
    t = timed(l1_topk, key_mat)
    print(f"level-1 top_k alone:  {t*1e3:8.1f} ms   (key matrix precomputed)")

    t = timed(make_key, xyz, new_xyz)
    print(f"key matrix material.: {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
