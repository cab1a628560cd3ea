"""PointNet++ backbone: 4 SA layers + 2 FP layers.

TPU-native rebuild of models/backbone_module.py:22-127 and the SA/FP modules
in lib/pointnet2/pointnet2_modules.py:164-416.  Channels-last; every grouping
output is (B, npoint, nsample, C) and the per-group PointNet is a SharedMLP
followed by a max over the sample axis — one big MXU matmul per layer.

Architecture constants (backbone_module.py:28-66):
  sa1: 2048 pts, r=0.2, 64 smp, mlp [C, 64, 64, 128]
  sa2: 1024 pts, r=0.4, 32 smp, mlp [128, 128, 128, 256]
  sa3:  512 pts, r=0.8, 16 smp, mlp [256, 128, 128, 256]
  sa4:  256 pts, r=1.2, 16 smp, mlp [256, 128, 128, 256]
  fp1/fp2: mlp [256+256, 256, 256]
All SA layers use_xyz + normalize_xyz; seeds are the 1024 fp2 points with
fp2_inds = sa1_inds[:, :1024] (backbone_module.py:119-126).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scan2cap_tpu.models.layers import SharedMLP
from scan2cap_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    query_and_group,
    three_nn,
    three_interpolate,
)
from scan2cap_tpu.ops.interpolate import interpolation_weights
from scan2cap_tpu.parallel.spatial import (
    ball_query_sharded,
    group_points_sharded,
    leaf_gathered_projection_sharded,
    query_and_group_sharded,
)


@jax.custom_vjp
def _leaf_gathered_projection(cat, ct_in, w0, idx):
    """group_points(cat @ w0, idx) - (ct_in @ w0)[:, :, None, :] with a
    scatter-free backward.

    The standard VJP of the neighbor gather is a scatter-add into the
    (B, N, D) projection — at sa1 shapes that scatter costs ~10x the gather
    (~400 ms vs 41 ms at B16 on v5e).  When ``cat``/``ct_in`` need no
    gradient (sa1: they derive from the raw input cloud), the only gradient
    consumer is w0, and dL/dw0 = gather(cat, idx)ᵀ·g - ct_inᵀ·Σₛg — a
    forward-style gather plus two small matmuls.  ONLY valid when the point
    features are leaves (PointnetSAModuleVotes.leaf_inputs)."""
    proj = cat @ w0
    ct = ct_in @ w0
    return group_points(proj, idx) - ct[:, :, None, :]


def _lgp_fwd(cat, ct_in, w0, idx):
    return _leaf_gathered_projection(cat, ct_in, w0, idx), (cat, ct_in, idx)


def _lgp_bwd(res, g):
    cat, ct_in, idx = res
    gath = group_points(cat, idx)                      # (B, M, S, Cin)
    dW = (jnp.einsum("bmsc,bmsd->cd", gath, g)
          - jnp.einsum("bmc,bmd->cd", ct_in, jnp.sum(g, axis=2)))
    return (jnp.zeros_like(cat), jnp.zeros_like(ct_in), dW,
            np.zeros(idx.shape, jax.dtypes.float0))


_leaf_gathered_projection.defvjp(_lgp_fwd, _lgp_bwd)


class PointnetSAModuleVotes(nn.Module):
    """Single-scale set-abstraction layer (pointnet2_modules.py:164-272)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]          # output widths (input width inferred)
    use_xyz: bool = True
    normalize_xyz: bool = True
    compute_dtype: Optional[str] = None
    storage_dtype: Optional[str] = None
    # Input xyz/features are autodiff LEAVES (raw data, not activations):
    # enables the scatter-free backward of the gather-lean projection.  Do
    # NOT set on layers fed by earlier layers (their feature grads would be
    # silently dropped).
    leaf_inputs: bool = False
    # Point-axis sharding (SURVEY §5.7 / VERDICT r4 #3): name of an ambient-
    # mesh axis to split the QUERY-CENTER axis over — ball query + grouping
    # run per-shard via shard_map (parallel/spatial.py) and the downstream
    # MLP/BN inherits the sharded layout from XLA's propagation.  FPS stays
    # replicated (serial scan; zero collectives — see parallel/spatial.py).
    # "" = off.  Requires npoint % axis_size == 0.
    spatial_axis: str = ""

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,                       # (B, N, 3)
        features: Optional[jax.Array],        # (B, N, C) or None
        inds: Optional[jax.Array] = None,     # (B, npoint) optional FPS inds
        train: bool = True,
        bn_momentum: jax.Array | float = 0.1,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)    # (B, npoint, 3)
        feats_in = features
        if self.compute_dtype is not None and features is not None:
            feats_in = features.astype(jnp.dtype(self.compute_dtype))
        mlp_mod = SharedMLP(self.mlp, compute_dtype=self.compute_dtype,
                            storage_dtype=self.storage_dtype, name="mlp")

        in_width = 3 + (features.shape[-1] if features is not None else 0)
        # fast path requires a bias-free layer 0 (bn=True) so the linear
        # decomposition is exact.  The decomposition itself ALWAYS runs in
        # f32 — in bf16 it would quantize ABSOLUTE room-scale coordinates
        # (the replaced formulation subtracts centers first and only ever
        # sees the small relative offsets) and lose ~1% of the output to
        # cancellation.  With compute_dtype=bfloat16 only the post-gather
        # MLP/BN chain (from_first) runs narrow: that is where the HBM
        # traffic is (the (B,M,S,C) activations are ~0.5-1 GB per pass at
        # sa1/B16), while the f32 projection matmul and gather stay exact.
        if self.use_xyz and in_width > self.mlp[0]:
            # Gather-lean path.  TPU gathers cost ~constant per ROW, so
            # gathering the (3+C)-wide raw features (2 register tiles at sa1)
            # is the single most expensive op of the backbone.  The MLP's
            # first layer is a bias-free linear (BN absorbs the bias), so
            # Dense_0([xyz_j - xyz_c; f_j]) == Dense_0([xyz_j; f_j]) -
            # Dense_0([xyz_c; 0]): project ALL source points once (dense
            # matmul), gather the narrow (mlp[0]-wide, one tile) projection,
            # and subtract the centers' projected-xyz term.  Same math as
            # pointnet2_modules.py:210-272 up to f32 reassociation.  Only
            # worth it when the projection is NARROWER than the input (xyz-
            # only configs gather 4ch raw rows — keep those as-is).
            sp = self.spatial_axis
            idx = (ball_query_sharded(xyz, new_xyz, self.radius,
                                      self.nsample, axis=sp) if sp
                   else ball_query(xyz, new_xyz, self.radius, self.nsample))
            scale = 1.0 / self.radius if self.normalize_xyz else 1.0
            feats_f = (features.astype(jnp.float32)
                       if features is not None else None)
            xyz_s = (xyz * scale).astype(jnp.float32)
            cat = (jnp.concatenate([xyz_s, feats_f], axis=-1)
                   if feats_f is not None else xyz_s)
            ct_in = (new_xyz * scale).astype(jnp.float32)
            if feats_f is not None:
                ct_in = jnp.concatenate(
                    [ct_in, jnp.zeros(ct_in.shape[:-1] + (feats_f.shape[-1],),
                                      jnp.float32)], axis=-1)
            if self.leaf_inputs:
                # scatter-free backward (see _leaf_gathered_projection); the
                # eye probe materializes the bias-free Dense_0 kernel so the
                # custom VJP can route the weight gradient
                w0 = mlp_mod.project_first(jnp.eye(in_width, dtype=xyz_s.dtype))
                g = (leaf_gathered_projection_sharded(
                         _leaf_gathered_projection, cat, ct_in, w0, idx,
                         axis=sp) if sp
                     else _leaf_gathered_projection(cat, ct_in, w0, idx))
            else:
                proj = mlp_mod.project_first(cat)        # (B, N, w0)
                ct = mlp_mod.project_first(ct_in)        # (B, npoint, w0)
                gathered = (group_points_sharded(proj, idx, axis=sp) if sp
                            else group_points(proj, idx))
                g = gathered - ct[:, :, None, :]
            if self.compute_dtype is not None:
                # relative-scale values only from here on: safe to narrow
                g = g.astype(jnp.dtype(self.compute_dtype))
            elif self.storage_dtype is not None:
                # storage-only narrowing: the (B,M,S,w0) pre-activation buffer
                # (the largest activation of the whole model at sa1) is stored
                # half-width; BN/matmul compute stays f32
                g = g.astype(jnp.dtype(self.storage_dtype))
            out = mlp_mod.from_first(g, train, bn_momentum)
        else:
            grouped = (query_and_group_sharded(
                xyz, new_xyz, feats_in, self.radius, self.nsample,
                axis=self.spatial_axis, use_xyz=self.use_xyz,
                normalize_xyz=self.normalize_xyz,
            ) if self.spatial_axis else query_and_group(
                xyz, new_xyz, feats_in, self.radius, self.nsample,
                use_xyz=self.use_xyz, normalize_xyz=self.normalize_xyz,
            ))                                # (B, npoint, nsample, [3+]C)
            # (no leaf_inputs handling here: with no parameters upstream of
            # the gather, autodiff never generates the scatter backward)
            if self.compute_dtype is not None:
                grouped = grouped.astype(jnp.dtype(self.compute_dtype))
            elif self.storage_dtype is not None:
                grouped = grouped.astype(jnp.dtype(self.storage_dtype))
            out = mlp_mod(grouped, train, bn_momentum)
        new_features = jnp.max(out, axis=2)   # (B, npoint, mlp[-1])
        return new_xyz, new_features, inds


class PointnetFPModule(nn.Module):
    """Feature-propagation layer (pointnet2_modules.py:356-416)."""

    mlp: Sequence[int]
    compute_dtype: Optional[str] = None
    storage_dtype: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        unknown: jax.Array,                   # (B, n, 3)
        known: jax.Array,                     # (B, m, 3)
        unknown_feats: Optional[jax.Array],   # (B, n, C1) or None
        known_feats: jax.Array,               # (B, m, C2)
        train: bool = True,
        bn_momentum: jax.Array | float = 0.1,
    ) -> jax.Array:
        dist, idx = three_nn(unknown, known)
        weight = interpolation_weights(dist)
        interpolated = three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated
        return SharedMLP(self.mlp, compute_dtype=self.compute_dtype,
                         storage_dtype=self.storage_dtype,
                         name="mlp")(new_features, train, bn_momentum)


class Pointnet2Backbone(nn.Module):
    """models/backbone_module.py:22-127, channels-last."""

    input_feature_dim: int = 0
    sa_npoints: Tuple[int, int, int, int] = (2048, 1024, 512, 256)
    compute_dtype: Optional[str] = None
    # storage-only narrowing (layer-boundary activation buffers half-width,
    # all matmul/BN compute f32) — the quality-safe half of the bf16 lever;
    # gated by the same bf16_components set.  Ignored where compute_dtype
    # applies (compute narrowing subsumes it).
    storage_dtype: Optional[str] = None
    # per-module gate for the narrow dtype ("sa1,...,fp"): the bf16 quality
    # bisection (TPU_DESIGN §8) narrows one module group at a time
    bf16_components: str = "sa1,sa2,sa3,sa4,fp"
    # point-axis sharding: mesh axis name for the SA query-center split
    # (see PointnetSAModuleVotes.spatial_axis); "" = off
    spatial_axis: str = ""

    @nn.compact
    def __call__(self, data_dict: dict, train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> dict:
        pc = data_dict["point_clouds"]        # (B, N, 3 + input_feature_dim)
        xyz = pc[..., :3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        comps = {c.strip() for c in self.bf16_components.split(",")}
        dt = {k: (self.compute_dtype if k in comps else None)
              for k in ("sa1", "sa2", "sa3", "sa4", "fp")}
        st = {k: (self.storage_dtype if k in comps else None)
              for k in ("sa1", "sa2", "sa3", "sa4", "fp")}

        d = dict(data_dict)
        np1, np2, np3, np4 = self.sa_npoints

        # sa1's xyz/features come straight from the input cloud (autodiff
        # leaves) — safe to drop their gradients for the scatter-free backward
        xyz, features, inds = PointnetSAModuleVotes(
            np1, 0.2, 64, (64, 64, 128), compute_dtype=dt["sa1"], storage_dtype=st["sa1"],
            leaf_inputs=True, spatial_axis=self.spatial_axis, name="sa1")(
                xyz, features, None, train, bn_momentum)
        d["sa1_inds"], d["sa1_xyz"], d["sa1_features"] = inds, xyz, features

        xyz, features, inds = PointnetSAModuleVotes(
            np2, 0.4, 32, (128, 128, 256), compute_dtype=dt["sa2"], storage_dtype=st["sa2"],
            spatial_axis=self.spatial_axis, name="sa2")(
                xyz, features, None, train, bn_momentum)
        d["sa2_inds"], d["sa2_xyz"], d["sa2_features"] = inds, xyz, features

        xyz, features, _ = PointnetSAModuleVotes(
            np3, 0.8, 16, (128, 128, 256), compute_dtype=dt["sa3"], storage_dtype=st["sa3"],
            spatial_axis=self.spatial_axis, name="sa3")(
                xyz, features, None, train, bn_momentum)
        d["sa3_xyz"], d["sa3_features"] = xyz, features

        xyz, features, _ = PointnetSAModuleVotes(
            np4, 1.2, 16, (128, 128, 256), compute_dtype=dt["sa4"], storage_dtype=st["sa4"],
            spatial_axis=self.spatial_axis, name="sa4")(
                xyz, features, None, train, bn_momentum)
        d["sa4_xyz"], d["sa4_features"] = xyz, features

        features = PointnetFPModule((256, 256), compute_dtype=dt["fp"],
            storage_dtype=st["fp"], name="fp1")(
            d["sa3_xyz"], d["sa4_xyz"], d["sa3_features"], d["sa4_features"],
            train, bn_momentum)
        features = PointnetFPModule((256, 256), compute_dtype=dt["fp"],
            storage_dtype=st["fp"], name="fp2")(
            d["sa2_xyz"], d["sa3_xyz"], d["sa2_features"], features,
            train, bn_momentum)

        d["fp2_features"] = features          # (B, 1024, 256)
        d["fp2_xyz"] = d["sa2_xyz"]
        num_seed = d["fp2_xyz"].shape[1]
        # indices of the seed points into the raw cloud
        # (backbone_module.py:124-126): sa2 sampled from sa1's 2048 points,
        # whose fps inds are just 0..1023, so fp2_inds = sa1_inds[:, :1024]
        d["fp2_inds"] = d["sa1_inds"][:, :num_seed]
        return d
