"""Graph-module parity: the dense masked EdgeConv vs a numpy
re-implementation of the reference's per-edge message passing
(graph_module.py:102-115 message/aggregate; :182-233 adjacency;
:247-314 forward with skip + invalid zeroing)."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.models.graph import GraphModule, query_locals_dense


def _corners(center, size):
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * size[0] / 2
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * size[1] / 2
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * size[2] / 2
    return np.stack([sx, sy, sz], 1) + center


def adjacency_reference_numpy(corners, masks, num_locals, overlay=0.5):
    """graph_module.py:182-233: per-target center distances, invalid/overlap
    masking, top-num_locals smallest."""
    B, K = masks.shape
    centers = (corners.min(2) + corners.max(2)) / 2
    adj = np.zeros((B, K, K))
    for b in range(B):
        lo, hi = corners[b].min(1), corners[b].max(1)
        vol = np.prod(hi - lo, -1)
        for i in range(K):
            d = np.sqrt(((centers[b, i] - centers[b]) ** 2).sum(-1) + 1e-8)
            d[masks[b] == 0] = 1e30
            # IoU(target, all)
            ilo = np.maximum(lo[i], lo)
            ihi = np.minimum(hi[i], hi)
            inter = np.prod(np.maximum(ihi - ilo, 0), -1)
            iou = inter / (vol[i] + vol - inter + 1e-8)
            d[iou >= overlay] = 1e30
            d[i] = 1e30  # include_self=False
            picks = np.argsort(d, kind="stable")[:num_locals]
            adj[b, i, picks] = 1
    return adj


def edgeconv_reference_numpy(p, x, adj, valid, num_layers):
    """EdgeConv layers (message MLP([x_tgt, x_src - x_tgt]), add-aggregation
    at the target) + final skip + invalid zeroing."""
    def dense(q, v):
        y = v @ np.asarray(q["kernel"])
        if "bias" in q:
            y = y + np.asarray(q["bias"])
        return y

    B, K, C = x.shape
    feat = x.copy()
    last_messages = None
    for layer in range(num_layers):
        q = p[f"gc_{layer}"]
        out = np.zeros_like(feat)
        msgs = {}
        for b in range(B):
            for i in range(K):
                for j in range(K):
                    if adj[b, i, j] != 1 or valid[b, i] == 0 or valid[b, j] == 0:
                        continue
                    e_in = np.concatenate([feat[b, j], feat[b, i] - feat[b, j]])
                    m = dense(q["map_edge_1"],
                              np.maximum(dense(q["map_edge_0"], e_in), 0))
                    out[b, j] += m          # aggregated at the neighbor
                    msgs[(b, i, j)] = m
        feat = out
        last_messages = msgs
    new_feats = (x + feat) * valid[..., None]
    return new_feats, last_messages


def test_dense_graph_matches_reference_equations(rng):
    B, K, L, C = 2, 8, 3, 16
    centers = rng.randn(B, K, 3).astype(np.float32) * 3
    sizes = rng.rand(B, K, 3).astype(np.float32) + 0.4
    corners = np.stack([
        np.stack([_corners(centers[b, k], sizes[b, k]) for k in range(K)])
        for b in range(B)]).astype(np.float32)
    masks = (rng.rand(B, K) > 0.25).astype(np.float32)
    feats = rng.randn(B, K, C).astype(np.float32)

    module = GraphModule(in_size=C, out_size=C, num_layers=2,
                         num_proposals=K, feat_size=C, num_locals=L,
                         query_mode="center", graph_mode="edge_conv")
    d = {"bbox_feature": jnp.asarray(feats),
         "bbox_mask": jnp.asarray(masks.astype(np.int32)),
         "bbox_corner": jnp.asarray(corners)}
    variables = module.init(jax.random.PRNGKey(0), d, train=False)
    out = module.apply(variables, d, train=False)

    # adjacency parity
    adj_want = adjacency_reference_numpy(corners, masks, L)
    np.testing.assert_array_equal(np.asarray(out["adjacent_mat"]), adj_want)

    # node features parity
    p = jax.tree.map(np.asarray, variables["params"])
    want_feats, want_msgs = edgeconv_reference_numpy(
        p, feats, adj_want, masks, num_layers=2)
    np.testing.assert_allclose(np.asarray(out["bbox_feature"]), want_feats,
                               atol=2e-4)

    # edge_feature rows: message of edge (i -> nbr) from the last layer
    nbr = np.asarray(out["edge_nbr_idx"])
    emask = np.asarray(out["edge_mask"])
    efeat = np.asarray(out["edge_feature"])
    checked = 0
    for b in range(B):
        for i in range(K):
            for l in range(L):
                j = nbr[b, i, l]
                if emask[b, i, l] == 1:
                    np.testing.assert_allclose(
                        efeat[b, i, l], want_msgs[(b, i, int(j))], atol=2e-4)
                    checked += 1
                else:
                    np.testing.assert_allclose(efeat[b, i, l], 0.0, atol=1e-6)
    assert checked > 5


def test_gcn_norm_matches_pyg_semantics(rng):
    # torch_geometric gcn_norm: ONE degree vector (in-degree of A+I) used
    # for both endpoints: norm(i->j) = d(i)^-1/2 * d(j)^-1/2
    from scan2cap_tpu.models.graph import GCNConvDense

    B, K, C, O = 1, 5, 4, 3
    adj = np.zeros((B, K, K), np.float32)
    adj[0, 0, 1] = 1          # asymmetric: 0->1 but not 1->0
    adj[0, 2, 1] = 1
    adj[0, 3, 4] = 1
    valid = np.ones((B, K), np.float32)
    x = rng.randn(B, K, C).astype(np.float32)

    mod = GCNConvDense(out_size=O)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(adj), jnp.asarray(valid))
    out = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(adj),
                               jnp.asarray(valid)))

    a = adj[0] + np.eye(K, dtype=np.float32)
    deg = a.sum(0)                                  # in-degree
    inv = 1.0 / np.sqrt(deg)
    norm = inv[:, None] * inv[None, :] * a
    W = np.asarray(variables["params"]["lin"]["kernel"])
    b_lin = np.asarray(variables["params"]["lin"]["bias"])
    bias = np.asarray(variables["params"]["bias"])
    h = x[0] @ W + b_lin
    want = norm.T @ h + bias                        # out[j] = sum_i norm(i,j) h[i]
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-6)
