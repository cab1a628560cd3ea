"""A/B the Pallas fused dist+pack ball query vs the XLA pack on the TPU.

In-jit repetition at B16 sa1 shapes (the measurement discipline of
CLAUDE.md / TPU_DESIGN §5: dispatch+readback costs ~27 ms on this host
link, and trace-time env knobs mean A/B arms must run via the explicit
``pack=`` argument, not the env var, inside ONE process — both arms here
are separate jit programs in the same process, compiled from the same
trace-time state).

Run: python scripts/micro_bq_pack.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.ops.grouping import ball_query
from scan2cap_tpu.ops.pallas.ballquery import ball_query_pack_pallas

B, N, M, NS, R = 16, 40000, 2048, 64, 0.2
REP = 8


def timed(make_fn, steps=4):
    fn = jax.jit(make_fn)
    float(fn(jnp.float32(0)))
    ts = []
    for s in range(steps):
        t0 = time.perf_counter()
        float(fn(jnp.float32((s + 1) * 1e-9)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REP * 1e3


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    xyz = jax.block_until_ready(jax.jit(
        lambda k: jax.random.uniform(k, (B, N, 3), minval=-4.0, maxval=4.0)
    )(key))
    q = xyz[:, :M]

    def rep(body):
        def fn(salt):
            def step(acc, i):
                out = body(xyz + (acc + salt + i) * 1e-12, q)
                return jnp.float32(jnp.sum(out % 128)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(REP, dtype=jnp.float32))
            return acc
        return fn

    # pack-only arms (words checksum instead of idx)
    def rep_pack(body):
        def fn(salt):
            def step(acc, i):
                w = body(xyz + (acc + salt + i) * 1e-12, q)
                return jnp.float32(jnp.sum(
                    w[:, ::64, ::64].astype(jnp.int32) % 128)), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(REP, dtype=jnp.float32))
            return acc
        return fn

    def xla_pack(x, qq):
        # the XLA words pack alone (mirrors _ball_query_chunk's pack)
        def per_scene(xs, qs):
            dx = qs[:, None, 0] - xs[None, :, 0]
            dy = qs[:, None, 1] - xs[None, :, 1]
            dz = qs[:, None, 2] - xs[None, :, 2]
            hit = dx * dx + dy * dy + dz * dz < R * R
            W = -(-N // 32)
            hitp = jnp.pad(hit, ((0, 0), (0, W * 32 - N)))
            bitpos = jax.lax.broadcasted_iota(jnp.uint32, (M, W, 32), 2)
            bits = jnp.where(hitp.reshape(M, W, 32),
                             jnp.uint32(1) << bitpos, jnp.uint32(0))
            return jnp.sum(bits, axis=-1, dtype=jnp.uint32)
        return jax.vmap(per_scene)(x, qq)

    t = timed(rep_pack(lambda x, qq: xla_pack(x, qq)))
    print(f"XLA pack (words only):        {t:7.2f} ms")

    t = timed(rep_pack(
        lambda x, qq: ball_query_pack_pallas(x, qq, R * R)[0]))
    print(f"Pallas fused dist+pack:       {t:7.2f} ms")

    t = timed(rep(lambda x, qq: ball_query(x, qq, R, NS, pack="xla")))
    print(f"exact bq end-to-end (xla):    {t:7.2f} ms")

    t = timed(rep(lambda x, qq: ball_query(x, qq, R, NS, pack="pallas")))
    print(f"exact bq end-to-end (pallas): {t:7.2f} ms")


if __name__ == "__main__":
    main()
