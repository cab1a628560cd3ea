"""Furthest-point sampling as a single Pallas kernel.

The pure-XLA FPS (ops/sampling.py) is a 2048-iteration ``lax.fori_loop``
whose (B, N) running-min state round-trips HBM every step; here the whole
loop runs inside one kernel with the state resident in VMEM, and the point
axis is laid out as an (8, N/8) tile so every VPU sublane is busy (a (1, N)
row would idle 7 of 8 sublanes).

Semantics identical to the CUDA kernel (sampling_gpu.cu:69-173): seed 0,
||p||² <= 1e-3 points excluded, argmax ties resolved to the lowest original
index (row-major position == original index).
Grid = batch; one program per scene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def _fps_kernel(xyz_ref, out_ref, temp_ref, npoint: int, n_valid: int):
    """xyz_ref: (1, 3*ROWS, cols) VMEM — rows [0:8)=x, [8:16)=y, [16:24)=z;
    out_ref: (1, 1, npad) int32; temp_ref: (ROWS, cols) f32 scratch."""
    cols = xyz_ref.shape[2]
    x = xyz_ref[0, 0:_ROWS, :]
    y = xyz_ref[0, _ROWS:2 * _ROWS, :]
    z = xyz_ref[0, 2 * _ROWS:3 * _ROWS, :]
    r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, cols), 1)
    orig = r * cols + c                      # original point index
    valid = ((x * x + y * y + z * z) > 1e-3) & (orig < n_valid)

    temp_ref[:] = jnp.full((_ROWS, cols), 1e10, jnp.float32)
    npad = out_ref.shape[2]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    BIG = jnp.int32(2 ** 30)

    def body(j, carry):
        last, out_row = carry
        # gather the last point's coords via one-hot reduce (no dynamic
        # scalar loads in Mosaic)
        sel = orig == last
        lx = jnp.sum(jnp.where(sel, x, 0.0))
        ly = jnp.sum(jnp.where(sel, y, 0.0))
        lz = jnp.sum(jnp.where(sel, z, 0.0))
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        t = jnp.minimum(temp_ref[:], d2)
        temp_ref[:] = t
        score = jnp.where(valid, t, -1.0)
        m = jnp.max(score)
        # first original index attaining the max (CUDA strict-> semantics)
        nxt = jnp.min(jnp.where(score == m, orig, BIG)).astype(jnp.int32)
        out_row = jnp.where(slot == j, nxt, out_row)
        return nxt, out_row

    _, out_row = jax.lax.fori_loop(
        1, npoint, body,
        (jnp.int32(0), jnp.zeros((1, npad), jnp.int32)))
    out_ref[0, :, :] = out_row


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int,
                                 interpret: bool = False) -> jax.Array:
    """(B, N, 3) -> (B, npoint) int32, one fused kernel per scene."""
    B, N, _ = xyz.shape
    Np = -(-N // (128 * _ROWS)) * (128 * _ROWS)
    cols = Np // _ROWS
    npad = -(-npoint // 128) * 128
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)       # (B, 3, N)
    if Np != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, Np - N)))
    # (B, 3, ROWS, cols) -> (B, 3*ROWS, cols), row-major point order per axis
    xyz_t = xyz_t.reshape(B, 3 * _ROWS, cols)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_valid=N)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3 * _ROWS, cols), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_ROWS, cols), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    return jax.lax.stop_gradient(out[:, 0, :npoint])
