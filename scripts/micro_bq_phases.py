"""Phase-level timing of the exact ball query at sa1 shapes.

Times, with in-jit repetition (the tunnel costs ~27 ms per dispatch):
  dist+pack   - distance pass fused into uint32 bitmask packing (words)
  +cumsum     - words + popcount prefix sums
  full exact  - the production ball_query (adds the slot decode)
  fps         - the production Pallas FPS at sa1 shapes, for context
  sa1 mlp     - SharedMLP-equivalent matmul work at sa1 shapes, for context

Run: python scripts/micro_bq_phases.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.ops import grouping

B, N, M, NS, R = 16, 40000, 2048, 64, 0.2
REP = 8


def timed_rep(make_fn, key, steps=4):
    fn = jax.jit(make_fn)
    float(jnp.sum(fn(key).astype(jnp.float32)))
    ts = []
    for s in range(steps):
        k = jax.random.fold_in(key, s)
        t0 = time.perf_counter()
        float(jnp.sum(fn(k).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REP


def scene(key):
    xyz = jax.random.uniform(key, (B, N, 3), minval=-4.0, maxval=4.0)
    return xyz, xyz[:, :M]


def pack_words(new_xyz, xyz, radius2):
    Mq = new_xyz.shape[0]
    Nn = xyz.shape[0]
    dx = new_xyz[:, None, 0] - xyz[None, :, 0]
    dy = new_xyz[:, None, 1] - xyz[None, :, 1]
    dz = new_xyz[:, None, 2] - xyz[None, :, 2]
    hit = dx * dx + dy * dy + dz * dz < radius2
    W = -(-Nn // 32)
    pad_n = W * 32 - Nn
    if pad_n:
        hit = jnp.pad(hit, ((0, 0), (0, pad_n)))
    bitpos = jax.lax.broadcasted_iota(jnp.uint32, (Mq, W, 32), 2)
    bits = jnp.where(hit.reshape(Mq, W, 32),
                     jnp.uint32(1) << bitpos, jnp.uint32(0))
    return jnp.sum(bits, axis=-1, dtype=jnp.uint32)


def rep_over(key, body):
    acc = jnp.float32(0)
    for i in range(REP):
        k = jax.random.fold_in(key, i)
        xyz, q = scene(k)
        acc = acc + body(xyz, q)
    return acc


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    r2 = R * R

    def chunked(fn3):
        # mirror production chunking: vmap over B, lax.map over M-chunks of 512
        def body(xyz, q):
            qc = q.reshape(B, M // 512, 512, 3)

            def per_batch(qb, xb):
                return jax.lax.map(lambda c: fn3(c, xb), qb)
            out = jax.vmap(per_batch)(qc, xyz)
            return jnp.sum(out.astype(jnp.float32))
        return body

    t = timed_rep(lambda k: rep_over(
        k, chunked(lambda q, x: pack_words(q, x, r2))), key)
    print(f"dist+pack:        {t*1e3:8.1f} ms")

    def pack_cum(q, x):
        words = pack_words(q, x, r2)
        pc = jax.lax.population_count(words).astype(jnp.int32)
        return jnp.cumsum(pc, axis=-1)

    t = timed_rep(lambda k: rep_over(k, chunked(pack_cum)), key)
    print(f"dist+pack+cumsum: {t*1e3:8.1f} ms")

    bq = functools.partial(grouping.ball_query, radius=R, nsample=NS,
                           mode="exact")
    t = timed_rep(lambda k: rep_over(
        k, lambda x, q: jnp.sum(bq(x, q).astype(jnp.float32))), key)
    print(f"full exact bq:    {t*1e3:8.1f} ms")

    from scan2cap_tpu.ops.sampling import furthest_point_sample

    t = timed_rep(lambda k: rep_over(
        k, lambda x, q: jnp.sum(
            furthest_point_sample(x, M).astype(jnp.float32))), key)
    print(f"fps (sa1):        {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
