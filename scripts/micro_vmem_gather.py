"""Microbenchmark: VMEM-resident-table row gather (Pallas) vs XLA's HBM
gather at sa1 shapes.

The sa1 neighbor gather reads 2048x64 = 131k rows of a (40960, 64) f32
table per scene (~38 ms at B16 through XLA's gather — CLAUDE.md's measured
13-18 ns/slice HBM floor).  The table is only 10.5 MB: it FITS IN VMEM.
This kernel stages the whole per-scene table once and serves every row
read from VMEM, measuring what Mosaic's dynamic-sublane reads can sustain.

Run: python scripts/micro_vmem_gather.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, C = 40960, 64
M, S = 2048, 64
ROWS = M * S                      # 131072 row reads per scene
BLK = 1024                        # rows per grid step
B = 16
REPS = 4                          # in-jit repetitions per timed dispatch


@jax.jit
def vmem_gather(table, idx):
    """(N, C) table, (ROWS,) idx -> (ROWS, C).

    The whole table is staged into VMEM once (constant index_map — the
    pipeline keeps a single resident buffer); each grid step serves BLK row
    reads from VMEM with its 4 KB index block in SMEM."""

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[i, :] = table_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(ROWS // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda r: (r,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N, C), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, C), table.dtype),
    )(idx, table)


@jax.jit
def vmem_gather_vec(table, idx):
    """Same, but the whole index block is handed to jnp.take inside the
    kernel — probes whether Mosaic has a vectorized sublane-gather lowering
    (tpu.dynamic_gather) that beats the scalar row loop."""

    def kernel(idx_ref, table_ref, out_ref):
        # manual 4-way unroll: is the 54-cycle/row cost loop overhead or
        # the dynamic-sublane read itself?
        def body(i, _):
            j = i * 4
            out_ref[j, :] = table_ref[idx_ref[j], :]
            out_ref[j + 1, :] = table_ref[idx_ref[j + 1], :]
            out_ref[j + 2, :] = table_ref[idx_ref[j + 2], :]
            out_ref[j + 3, :] = table_ref[idx_ref[j + 3], :]
            return 0
        jax.lax.fori_loop(0, BLK // 4, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(ROWS // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda r: (r,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N, C), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, C), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, C), table.dtype),
    )(idx, table)


@jax.jit
def xla_gather(table, idx):
    return jnp.take(table, idx, axis=0)


def timed(fn, *args, tag=""):
    # REPS chained dispatches with a data dependency via the table salt
    @jax.jit
    def many(table, idx, salt):
        acc = jnp.float32(0)
        t = table
        for r in range(REPS):
            out = fn(t + salt * (r + 1), idx)
            acc = acc + jnp.sum(out[::997, 0])
        return acc

    table, idx = args
    float(many(table, idx, jnp.float32(1e-9)))     # compile+warm
    ts = []
    for s in range(4):
        t0 = time.perf_counter()
        float(many(table, idx, jnp.float32((s + 2) * 1e-9)))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / REPS
    ns_per_slice = dt / ROWS * 1e9
    print(f"{tag}: {dt * 1e3:.2f} ms per scene-gather "
          f"({ns_per_slice:.1f} ns/slice; B16 extrapolation "
          f"{dt * 1e3 * B:.1f} ms)")
    return dt


def main():
    # synthesize ON DEVICE (CLAUDE.md: the host link is a ~1.6 MB/s tunnel;
    # shipping the 10.5 MB table would stall the first use for ~7 s)
    key = jax.random.PRNGKey(0)
    table = jax.block_until_ready(
        jax.random.normal(key, (N, C), jnp.float32))
    idx = jax.block_until_ready(jax.random.randint(
        jax.random.fold_in(key, 1), (ROWS,), 0, N, jnp.int32))

    timed(xla_gather, table, idx, tag="XLA HBM gather   ")
    timed(vmem_gather, table, idx, tag="Pallas VMEM gather")
    try:
        timed(vmem_gather_vec, table, idx, tag="Pallas VMEM take ")
    except Exception as e:
        print(f"Pallas VMEM take : unsupported ({type(e).__name__}: "
              f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
