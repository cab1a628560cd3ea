"""Ball query + grouping.

TPU-native replacements for ``ball_query_gpu.cu`` / ``group_points_gpu.cu``.

``ball_query`` reproduces the CUDA semantics exactly
(ball_query_gpu.cu:9-54): for every query center, the N source points are
scanned in index order and the first ``nsample`` with squared distance
strictly below radius² are kept; *all* slots are pre-filled with the first
hit's index, so when fewer than ``nsample`` points fall in the ball, padding
repeats the first neighbor; a center with no hits returns all-zeros (the
torch wrapper allocates the output with zeros).

Vectorized construction: "first nsample hits in index order" == the nsample
smallest values of ``key = index if hit else N + index`` — a top-k over the
negated key, no scatter and no sort of the full axis.  The (M, N) distance
matrix is processed in chunks over the query axis to bound memory at
N = 40k points.

``group_points`` is a plain XLA gather; its scatter-add gradient
(group_points_gpu.cu:34-75) falls out of autodiff.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# "exact": CUDA-parity first-k in scan order (hierarchical blockwise top-k).
# "approx": lax.approx_min_k with 0.99 recall — ~1.7x faster on TPU; the ~1%
# substituted slots are still valid in-ball points, just later in scan order
# (the scan order is a random permutation after dataset sampling anyway).
DEFAULT_BALL_QUERY_MODE = "exact"


def set_ball_query_mode(mode: str) -> None:
    global DEFAULT_BALL_QUERY_MODE
    assert mode in ("exact", "approx"), mode
    DEFAULT_BALL_QUERY_MODE = mode


def _first_k_keys(key: jax.Array, nsample: int, N: int,
                  block: int = 512) -> jax.Array:
    """Smallest ``nsample`` values per row of ``key`` (M, N), where entries
    >= N mean "miss".  Exact hierarchical top-k: a full top_k over N = 40k is
    the single hottest op of the whole pipeline, so reduce per N-block first
    (each block's first-k is a superset filter of the global first-k)."""
    M = key.shape[0]
    k = min(nsample, N)
    # repeatedly reduce blockwise until the candidate axis is small; each
    # block's first-k is a superset filter of the global first-k, so this is
    # exact at every level
    while key.shape[1] > 2 * block:
        n_cur = key.shape[1]
        pad = (-n_cur) % block
        if pad:
            key = jnp.concatenate(
                [key, jnp.full((M, pad), 2 * N, key.dtype)], axis=1)
        nb = (n_cur + pad) // block
        blocked = key.reshape(M, nb, block)
        kb = min(k, block)
        neg, _ = jax.lax.top_k(-blocked, kb)          # (M, nb, kb)
        key = (-neg).reshape(M, nb * kb)
    neg_topk, _ = jax.lax.top_k(-key, k)
    cand = -neg_topk
    if k < nsample:
        cand = jnp.concatenate(
            [cand, jnp.full((M, nsample - k), 2 * N, cand.dtype)], axis=1)
    return cand


def _ball_query_chunk(new_xyz: jax.Array, xyz: jax.Array, radius2: float,
                      nsample: int, mode: str = "exact") -> jax.Array:
    """new_xyz: (M, 3), xyz: (N, 3) -> (M, nsample) int32."""
    N = xyz.shape[0]
    # broadcast-diff form: XLA fuses it without materializing (M, N, 3), and
    # it matches the CUDA kernel's f32 arithmetic exactly (a |c|²-2cx+|x|²
    # matmul form benches the same but loses boundary-precision parity)
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)  # (M,N)
    hit = d2 < radius2
    order = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    # nsample smallest keys == first nsample hits in index order;
    # when nsample > N (huge balls, e.g. MaskVoteNet's 512-sample r=5 query
    # over few votes) the extra slots are first-hit padding
    if mode == "approx" and nsample <= N and N >= 4096:
        keyf = jnp.where(hit, order.astype(jnp.float32), jnp.float32(2 * N))
        vals, _ = jax.lax.approx_min_k(keyf, nsample, recall_target=0.99)
        cand = jnp.sort(vals.astype(jnp.int32), axis=1)  # restore scan order
    else:
        key = jnp.where(hit, order, order + N)
        cand = _first_k_keys(key, nsample, N)
    valid = cand < N
    idx = jnp.where(valid, cand, 0)
    # pad invalid slots with the first hit (slot 0); if no hit at all,
    # slot 0 is itself invalid -> idx[...,0] == 0 == zero-filled output.
    first = jnp.where(valid[:, :1], idx[:, :1], 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def ball_query(xyz: jax.Array, new_xyz: jax.Array, radius: float,
               nsample: int, chunk: int = 512,
               mode: Optional[str] = None) -> jax.Array:
    """Dispatch wrapper so the module-level mode toggle is honored at trace
    time (set_ball_query_mode)."""
    return _ball_query(xyz, new_xyz, radius, nsample, chunk,
                       mode or DEFAULT_BALL_QUERY_MODE)


@functools.partial(jax.jit,
                   static_argnames=("radius", "nsample", "chunk", "mode"))
def _ball_query(xyz: jax.Array, new_xyz: jax.Array, radius: float,
                nsample: int, chunk: int = 512,
                mode: str = "exact") -> jax.Array:
    """Radius neighbor search with CUDA-parity padding semantics.

    Args:
      xyz: (B, N, 3) source points.
      new_xyz: (B, M, 3) query centers.
      radius: ball radius.
      nsample: neighbors per center (static).
      chunk: query-axis chunk size bounding the (chunk, N) distance tile.

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    B, M, _ = new_xyz.shape
    radius2 = float(radius) ** 2
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    if M <= chunk:
        fn = functools.partial(_ball_query_chunk, radius2=radius2,
                               nsample=nsample, mode=mode)
        return jax.lax.stop_gradient(jax.vmap(fn)(new_xyz, xyz))

    pad = (-M) % chunk
    nq = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    nq = nq.reshape(B, (M + pad) // chunk, chunk, 3)

    def per_batch(nq_b, xyz_b):
        def per_chunk(q):
            return _ball_query_chunk(q, xyz_b, radius2, nsample, mode)
        return jax.lax.map(per_chunk, nq_b)

    out = jax.vmap(per_batch)(nq, xyz)                 # (B, nchunk, chunk, S)
    out = out.reshape(B, M + pad, nsample)[:, :M]
    return jax.lax.stop_gradient(out)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighborhood features.

    Args:
      features: (B, N, C).
      idx: (B, M, S) int32 indices into N.

    Returns:
      (B, M, S, C).
    """
    B, N, C = features.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, S, C)


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array],
    radius: float,
    nsample: int,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    ret_grouped_xyz: bool = False,
):
    """Ball query + relative-coordinate grouping (pointnet2_utils.py:294-377).

    Matches ``QueryAndGroup``: grouped xyz is recentred on the query point and
    optionally divided by the radius; point features are concatenated after
    the 3 xyz channels (channels-last here).

    Returns (B, M, S, 3+C) [or (B, M, S, C)], plus grouped_xyz if requested.
    """
    idx = ball_query(xyz, new_xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_features = group_points(features, idx)
        new_features = (
            jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
            if use_xyz else grouped_features
        )
    else:
        if not use_xyz:
            raise ValueError("cannot have no features and use_xyz=False")
        new_features = grouped_xyz
    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features
