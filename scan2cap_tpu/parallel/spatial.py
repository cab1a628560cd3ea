"""Point-axis (spatial) sharding for the set-abstraction hot path.

The reference handles big scenes by random down-sampling to a fixed budget
on one GPU (utils/pc_utils.py:32-40).  On a TPU slice the point axis itself
can be sharded: every query center's ball query / grouping is independent of
the other centers, so the QUERY axis (M) splits across devices with the
source cloud replicated — each device scans its M/D centers over the full N
points, and XLA's all-gather (over ICI) reassembles the neighborhoods.  This
is how the static point budget scales past one chip's FLOPs without changing
any op semantics (SURVEY.md §5.7: "shard the point axis within the SA
kernels and the batch axis across chips").

These wrappers are exact: the underlying ops are deterministic per query, so
sharded == unsharded index-for-index (tested on the 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scan2cap_tpu.ops.grouping import ball_query, group_points


def ball_query_sharded(xyz: jax.Array, new_xyz: jax.Array, radius: float,
                       nsample: int, mesh: Mesh,
                       axis: str = "model") -> jax.Array:
    """Exact ball query with the query-center axis sharded over ``axis``.

    xyz (B, N, 3) replicated; new_xyz (B, M, 3) with M divisible by the mesh
    axis size.  Returns (B, M, nsample) int32, identical to the unsharded op.
    """
    M = new_xyz.shape[1]
    size = mesh.shape[axis]
    assert M % size == 0, (M, size)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None))
    def _shard(xyz_rep, q_shard):
        return ball_query(xyz_rep, q_shard, radius, nsample)

    return _shard(xyz, new_xyz)


def group_points_sharded(features: jax.Array, idx: jax.Array, mesh: Mesh,
                         axis: str = "model") -> jax.Array:
    """Neighborhood gather with the query axis of ``idx`` sharded; the
    feature table stays replicated.  (B, M, S) -> (B, M, S, C)."""
    size = mesh.shape[axis]
    assert idx.shape[1] % size == 0

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None, None))
    def _shard(feats_rep, idx_shard):
        return group_points(feats_rep, idx_shard)

    return _shard(features, idx)


def query_and_group_sharded(xyz: jax.Array, new_xyz: jax.Array,
                            features: Optional[jax.Array], radius: float,
                            nsample: int, mesh: Mesh, axis: str = "model",
                            use_xyz: bool = True,
                            normalize_xyz: bool = False) -> jax.Array:
    """Sharded QueryAndGroup: ball query + recentred grouping with the query
    axis split across the mesh (ops/grouping.query_and_group semantics)."""
    idx = ball_query_sharded(xyz, new_xyz, radius, nsample, mesh, axis)
    grouped_xyz = group_points_sharded(xyz, idx, mesh, axis) \
        - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is None:
        if not use_xyz:
            raise ValueError("cannot have no features and use_xyz=False")
        return grouped_xyz
    grouped_features = group_points_sharded(features, idx, mesh, axis)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
    return grouped_features
