"""Relational graph module — dense masked rebuild of models/graph_module.py.

The reference builds a per-scene variable-size torch-geometric graph with a
Python loop over 256 targets for the adjacency (graph_module.py:224-233) and
a per-scene scipy→EdgeConv loop (graph_module.py:260-304).  Here everything is
one vectorized XLA program:

* adjacency: all-pairs distances + IoU in one (B, K, K) pass;
* EdgeConv: each row i contributes exactly ``num_locals`` edges (i → nbr),
  messages are an MXU matmul over the (B·K·L) edge list, aggregation is a
  segment-sum scatter back onto nodes.

Semantics notes vs the reference:
* message for edge (i → j) is MLP([x_j, x_i − x_j]) aggregated at j with
  "add" — torch_geometric flow source_to_target, x_i=target (EdgeConv.message,
  graph_module.py:102-109);
* neighbor slots are ordered by ascending proposal index, matching the coo
  row-major edge order the reference relies on for its edge-feature reshape
  (graph_module.py:282-297);
* ``edge_feature``/``edge_orientations``/``edge_distances`` are indexed by raw
  proposal id (B, K, L, ...) plus an explicit ``edge_mask``.  The reference
  indexes rows by *valid-submatrix position* when writing but by raw proposal
  id when reading (caption_module.py:394-414) — these coincide exactly when
  all proposals are valid; we use the consistent raw-id space everywhere;
* invalid proposals get zero features after the graph (the reference only
  scatters valid rows into a zeros tensor, graph_module.py:247,302-304).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scan2cap_tpu.ops.boxes import box3d_iou_matrix


def bbox_centers(corners: jax.Array) -> jax.Array:
    """(..., 8, 3) -> (..., 3): AABB center (graph_module.py:176-180)."""
    return (jnp.min(corners, axis=-2) + jnp.max(corners, axis=-2)) / 2.0


def mask_and_topk_locals(dist: jax.Array, invalid: jax.Array,
                         iou: jax.Array, self_mask: jax.Array,
                         num_locals: int, overlay_threshold: float,
                         include_self: bool = True) -> jax.Array:
    """THE locality rule (_query_locals, caption_module.py:322-363 ==
    graph_module.py:182-222), shared by ``query_locals_dense`` (all targets,
    graph/train) and ``caption.query_locals_for_targets`` (one target per
    sample) so the two paths cannot drift: invalid neighbors -> INF,
    overlapping boxes (IoU >= threshold, includes self at IoU=1) -> INF,
    then the self slot -> 0 (include_self) or INF, then the
    ``num_locals`` SMALLEST distances win.  All masks broadcast against
    ``dist`` (last axis = K neighbor slots); returns the top-k indices."""
    INF = jnp.asarray(1e30, dist.dtype)
    dist = jnp.where(invalid, INF, dist)
    dist = jnp.where(iou >= overlay_threshold, INF, dist)
    dist = jnp.where(self_mask, 0.0 if include_self else INF, dist)
    return jax.lax.top_k(-dist, num_locals)[1]


def query_locals_dense(
    corners: jax.Array,          # (B, K, 8, 3)
    object_masks: jax.Array,     # (B, K) 0/1
    num_locals: int,
    query_mode: str = "center",
    include_self: bool = True,
    overlay_threshold: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """All-targets version of _query_locals (graph_module.py:182-222).

    Returns:
      local_masks: (B, K, K) float 0/1 — row t is the local mask of target t.
      nbr_idx: (B, K, num_locals) int32 — selected neighbors of each target,
        sorted by ascending proposal index (== reference edge order).
    """
    B, K = object_masks.shape
    centers = bbox_centers(corners)                      # (B, K, 3)

    if query_mode == "center":
        diff = centers[:, :, None, :] - centers[:, None, :, :]
        dist = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-8)          # (B,K,K)
    elif query_mode == "corner":
        # min over the target's 8 corners of corner→center distance
        diff = corners[:, :, :, None, :] - centers[:, None, None, :, :]
        dist = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-8)          # (B,K,8,K)
        dist = jnp.min(dist, axis=2)
    else:
        raise ValueError(f"invalid query_mode {query_mode}")

    iou = jax.vmap(box3d_iou_matrix)(corners, corners)               # (B,K,K)
    topk_ids = mask_and_topk_locals(
        dist, object_masks[:, None, :] == 0, iou,
        jnp.eye(K, dtype=bool)[None], num_locals, overlay_threshold,
        include_self)                                                # (B,K,L)

    local_masks = jnp.zeros((B, K, K), jnp.float32)
    b_ix = jnp.arange(B)[:, None, None]
    t_ix = jnp.arange(K)[None, :, None]
    local_masks = local_masks.at[b_ix, t_ix, topk_ids].set(1.0)

    # neighbors sorted ascending by proposal index: smallest-L of
    # key = j if selected else K + j
    order = jnp.arange(K, dtype=jnp.int32)[None, None, :]
    key = jnp.where(local_masks > 0, order, order + K)
    neg_topk, _ = jax.lax.top_k(-key, num_locals)
    nbr_idx = (-neg_topk).astype(jnp.int32) % K                      # (B,K,L)
    return local_masks, nbr_idx


class EdgeConvDense(nn.Module):
    """EdgeConv message MLP (graph_module.py:22-115) over a dense edge list."""

    out_size: int
    aggregation: str = "add"

    @nn.compact
    def __call__(self, x: jax.Array, nbr_idx: jax.Array,
                 edge_mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (B,K,C), nbr_idx (B,K,L), edge_mask (B,K,L) ->
        (node_out (B,K,out), messages (B,K,L,out))."""
        B, K, C = x.shape
        L = nbr_idx.shape[-1]
        x_src = x[:, :, None, :]                                     # (B,K,1,C) = x_i
        x_tgt = jnp.take_along_axis(
            x, nbr_idx.reshape(B, K * L)[..., None], axis=1
        ).reshape(B, K, L, C)                                        # x_j = x[nbr]
        edge_in = jnp.concatenate(
            [x_tgt, x_src - x_tgt], axis=-1)                         # (B,K,L,2C)
        h = nn.Dense(self.out_size, name="map_edge_0")(edge_in)
        h = nn.relu(h)
        messages = nn.Dense(self.out_size, name="map_edge_1")(h)     # (B,K,L,out)
        messages = messages * edge_mask[..., None]

        # aggregate at the *neighbor* node (flow source → target)
        flat_msg = messages.reshape(B * K * L, self.out_size)
        seg_ids = (nbr_idx.reshape(B, K * L)
                   + (jnp.arange(B, dtype=jnp.int32) * K)[:, None]).reshape(-1)
        node_out = jax.ops.segment_sum(flat_msg, seg_ids, num_segments=B * K)
        node_out = node_out.reshape(B, K, self.out_size)
        if self.aggregation == "mean":
            cnt = jax.ops.segment_sum(
                edge_mask.reshape(-1), seg_ids, num_segments=B * K)
            node_out = node_out / jnp.maximum(cnt, 1.0).reshape(B, K, 1)
        return node_out, messages


class GCNConvDense(nn.Module):
    """Dense GCNConv (torch_geometric GCNConv semantics: add self loops,
    symmetric deg^-1/2 normalization)."""

    out_size: int

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array,
                 valid: jax.Array) -> jax.Array:
        """x (B,K,C), adj (B,K,K) with adj[i,j]=1 for edge i->j, valid (B,K)."""
        B, K, _ = x.shape
        # restrict to valid x valid, add self loops on valid nodes
        a = adj * valid[:, :, None] * valid[:, None, :]
        a = a + jnp.eye(K)[None] * valid[:, :, None]
        # message flows i -> j.  torch_geometric's gcn_norm computes ONE
        # degree vector — the in-degree (scatter over the target column) —
        # and uses it for BOTH endpoints: norm(i->j) = d_in(i)^-1/2 *
        # d_in(j)^-1/2.  The local-neighbor adjacency is asymmetric, so
        # using the out-degree at the source would diverge from the
        # reference on every real graph.
        deg_in = jnp.sum(a, axis=1)
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg_in, 1e-12))
        norm = (inv_sqrt[:, :, None] * inv_sqrt[:, None, :]) * a
        h = nn.Dense(self.out_size, name="lin")(x)
        out = jnp.einsum("bij,bic->bjc", norm, h)
        bias = self.param("bias", nn.initializers.zeros, (self.out_size,))
        return out + bias


class GraphModule(nn.Module):
    in_size: int = 128
    out_size: int = 128
    num_layers: int = 2
    num_proposals: int = 256
    feat_size: int = 128
    num_locals: int = 10
    query_mode: str = "center"
    graph_mode: str = "edge_conv"
    return_edge: bool = False
    graph_aggr: str = "add"
    return_orientation: bool = False
    num_bins: int = 6
    return_distance: bool = False
    overlay_threshold: float = 0.5

    @nn.compact
    def __call__(self, data_dict: dict, train: bool = True) -> dict:
        d = dict(data_dict)
        obj_feats = d["bbox_feature"]                    # (B, K, C)
        object_masks = d["bbox_mask"].astype(jnp.float32)  # (B, K)
        B, K, _ = obj_feats.shape
        L = self.num_locals

        adjacent_mat, nbr_idx = query_locals_dense(
            d["bbox_corner"], object_masks, L, self.query_mode,
            include_self=False, overlay_threshold=self.overlay_threshold)

        valid = object_masks
        nbr_valid = jnp.take_along_axis(
            valid, nbr_idx.reshape(B, K * L), axis=1).reshape(B, K, L)
        edge_mask = valid[:, :, None] * nbr_valid         # (B, K, L)

        feat = obj_feats
        messages = jnp.zeros((B, K, L, self.out_size), obj_feats.dtype)
        if self.graph_mode == "edge_conv":
            for i in range(self.num_layers):
                feat, messages = EdgeConvDense(
                    self.out_size, self.graph_aggr, name=f"gc_{i}")(
                        feat, nbr_idx, edge_mask)
        elif self.graph_mode == "graph_conv":
            for i in range(self.num_layers):
                feat = GCNConvDense(self.out_size, name=f"gc_{i}")(
                    feat, adjacent_mat, valid)
        else:
            raise ValueError(f"invalid graph_mode {self.graph_mode}")

        if self.return_orientation:
            # extra edge layer on final node features, pre-skip
            # (graph_module.py:291-293)
            _, edge_msg = EdgeConvDense(
                self.out_size, self.graph_aggr, name="edge_layer")(
                    feat, nbr_idx, edge_mask)
            edge_pred = nn.Dense(self.num_bins + 1, name="edge_predict")(edge_msg)
            d["edge_orientations"] = edge_pred[..., :-1]   # (B, K, L, num_bins)
            d["edge_distances"] = edge_pred[..., -1]       # (B, K, L)
        else:
            d["edge_orientations"] = jnp.zeros((B, K, L, self.num_bins),
                                               obj_feats.dtype)
            d["edge_distances"] = jnp.zeros((B, K, L), obj_feats.dtype)

        # skip connection + zero out invalid nodes (graph_module.py:247,302-304)
        new_obj_feats = (obj_feats + feat) * valid[..., None]

        d["bbox_feature"] = new_obj_feats
        d["adjacent_mat"] = adjacent_mat
        d["edge_feature"] = messages                      # (B, K, L, out)
        d["edge_nbr_idx"] = nbr_idx                       # (B, K, L)
        d["edge_mask"] = edge_mask                        # (B, K, L)
        return d
