"""Point-axis (spatial) sharding for the set-abstraction hot path.

The reference handles big scenes by random down-sampling to a fixed budget
on one GPU (utils/pc_utils.py:32-40).  On a TPU slice the point axis itself
can be sharded: every query center's ball query / grouping is independent of
the other centers, so the QUERY axis (M) splits across devices with the
source cloud replicated (within a data shard: on the production
("data", "model") mesh the scene axis stays sharded over "data" —
``_batch_axis``) — each device scans its M/D centers over the full N
points of its scenes, and XLA's all-gather (over ICI) reassembles the
neighborhoods.  This
is how the static point budget scales past one chip's FLOPs without changing
any op semantics (SURVEY.md §5.7: "shard the point axis within the SA
kernels and the batch axis across chips").

These wrappers are exact: the underlying ops are deterministic per query, so
sharded == unsharded index-for-index (tested on the 8-device CPU mesh).

Integration (VERDICT r4 #3): ``ModelConfig.spatial_axis`` routes every SA
layer's ball query + grouping through these wrappers inside the backbone —
``mesh=None`` resolves the AMBIENT mesh (``jax.set_mesh``), so the flax
modules need no mesh plumbing.  FPS is NOT spatially sharded: it is a
2048-iteration serial scan whose per-iteration work is a (B, N) VPU pass —
sharding N would insert a cross-device argmax (psum + all-gather) into the
serial dependency chain 2048 times, while replicating it costs zero
collectives (every device computes identical indices from the replicated
cloud).  The dryrun's spatial stage counts the resulting collective bytes
(__graft_entry__._spatial_stage).

``check_vma=False``: the backward of a grouping whose feature table is
replicated psums the per-shard scatter cotangents; jax's static replication
checker cannot infer that and the autodiff transpose would be rejected with
it on.  Gradient correctness is asserted against the unsharded op in
tests/test_parallel_spatial.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scan2cap_tpu.ops.grouping import ball_query, group_points


def _batch_axis(mesh, b: int, axis: str):
    """Scene-axis spec component for the shard_map in/out specs.

    On the production ("data", "model") training mesh the upstream
    activations arrive with the scene axis sharded P("data") — declaring it
    replicated here would all-gather every SA layer's point/feature tables
    over the data axis at the shard_map boundary and duplicate the ball
    query/grouping work n_data times.  Shard over "data" whenever the mesh
    has that axis and it divides B; replicate otherwise (the 1-axis
    ("spatial",)/("model",) meshes of the dryrun and unit tests, or when
    the QUERY axis itself is sharded over "data" — a PartitionSpec cannot
    name one mesh axis twice)."""
    if axis == "data":
        return None
    n = dict(mesh.shape).get("data", 0)
    return "data" if n and b % n == 0 else None


def _resolve_mesh(mesh, axis: str):
    """Concrete mesh if given, else the ambient (jax.set_mesh) mesh; the
    named axis must exist and divide nothing here — callers assert shape
    divisibility with their own shapes."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or axis not in getattr(mesh, "shape", {}):
            raise ValueError(
                f"spatial sharding over axis {axis!r} needs a mesh with that "
                f"axis — pass mesh= or enter jax.set_mesh(Mesh(..., "
                f"({axis!r},))); ambient mesh is {mesh}")
    if axis not in dict(mesh.shape):
        raise ValueError(f"mesh {mesh} has no axis {axis!r}")
    return mesh


def ball_query_sharded(xyz: jax.Array, new_xyz: jax.Array, radius: float,
                       nsample: int, mesh: Optional[Mesh] = None,
                       axis: str = "model") -> jax.Array:
    """Exact ball query with the query-center axis sharded over ``axis``.

    xyz (B, N, 3) replicated within a data shard (its scene axis rides the
    mesh's "data" axis when present — ``_batch_axis``); new_xyz (B, M, 3)
    with M divisible by the mesh axis size.  Returns (B, M, nsample) int32,
    identical to the unsharded op.
    """
    mesh = _resolve_mesh(mesh, axis)
    M = new_xyz.shape[1]
    size = dict(mesh.shape)[axis]
    assert M % size == 0, (M, size)
    dp = _batch_axis(mesh, new_xyz.shape[0], axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(dp, None, None), P(dp, axis, None)),
        out_specs=P(dp, axis, None))
    def _shard(xyz_rep, q_shard):
        return ball_query(xyz_rep, q_shard, radius, nsample)

    return _shard(xyz, new_xyz)


def group_points_sharded(features: jax.Array, idx: jax.Array,
                         mesh: Optional[Mesh] = None,
                         axis: str = "model") -> jax.Array:
    """Neighborhood gather with the query axis of ``idx`` sharded; the
    feature table is replicated within a data shard (scene axis on "data"
    when the mesh has it).  (B, M, S) -> (B, M, S, C)."""
    mesh = _resolve_mesh(mesh, axis)
    size = dict(mesh.shape)[axis]
    assert idx.shape[1] % size == 0
    dp = _batch_axis(mesh, idx.shape[0], axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(dp, None, None), P(dp, axis, None)),
        out_specs=P(dp, axis, None, None))
    def _shard(feats_rep, idx_shard):
        return group_points(feats_rep, idx_shard)

    return _shard(features, idx)


def leaf_gathered_projection_sharded(lgp_fn, cat: jax.Array, ct_in: jax.Array,
                                     w0: jax.Array, idx: jax.Array,
                                     mesh: Optional[Mesh] = None,
                                     axis: str = "model") -> jax.Array:
    """Query-axis-sharded call of the backbone's scatter-free sa1 projection
    (models/backbone._leaf_gathered_projection, passed in as ``lgp_fn`` to
    avoid a models<->parallel import cycle).

    cat (B, N, Cin) replicated within a data shard (scene axis on "data"
    when the mesh has it) and w0 (Cin, D) fully replicated; ct_in
    (B, M, Cin) and idx (B, M, S) sharded over the query axis.  The custom
    VJP runs per-shard; its dW partials are psummed by the shard_map
    transpose (replicated-input cotangent — w0's over every mesh axis,
    cat's over the query axis only), asserted against the unsharded
    gradient in tests/test_parallel_spatial.py."""
    mesh = _resolve_mesh(mesh, axis)
    size = dict(mesh.shape)[axis]
    assert idx.shape[1] % size == 0
    dp = _batch_axis(mesh, idx.shape[0], axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(dp, None, None), P(dp, axis, None), P(),
                  P(dp, axis, None)),
        out_specs=P(dp, axis, None, None))
    def _shard(cat_rep, ct_shard, w0_rep, idx_shard):
        return lgp_fn(cat_rep, ct_shard, w0_rep, idx_shard)

    return _shard(cat, ct_in, w0, idx)


def query_and_group_sharded(xyz: jax.Array, new_xyz: jax.Array,
                            features: Optional[jax.Array], radius: float,
                            nsample: int, mesh: Optional[Mesh] = None,
                            axis: str = "model",
                            use_xyz: bool = True,
                            normalize_xyz: bool = False) -> jax.Array:
    """Sharded QueryAndGroup: ball query + recentred grouping with the query
    axis split across the mesh (ops/grouping.query_and_group semantics)."""
    mesh = _resolve_mesh(mesh, axis)
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
