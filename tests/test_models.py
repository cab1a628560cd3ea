"""Smoke + shape tests for the model stack on tiny configs (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet, select_target

TINY = ModelConfig(
    num_points=512,
    num_proposals=16,
    sa_npoints=(128, 64, 32, 16),
    max_num_obj=8,
    num_locals=4,
)


def _make(cfg, **kw):
    vocab = make_vocab(num_vocabs=32)
    batch = make_scene_batch(cfg, batch_size=2, num_objects=3, vocab=vocab)
    model = CapNet(cfg, num_vocabs=32, **kw)
    # unjitted init/apply dispatch op-by-op (CLAUDE.md) — always jit in tests
    variables = jax.jit(
        model.init, static_argnames=("use_tf", "is_eval", "train"))(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.items()},
        use_tf=True, is_eval=False, train=False)
    return model, variables, batch, vocab


def _jit_apply(model):
    return jax.jit(model.apply,
                   static_argnames=("use_tf", "is_eval", "train", "mutable"))


@pytest.fixture(scope="module")
def tiny():
    """One compiled TINY CapNet shared by the shape/select tests (each test
    owning its own full-model compile dominated the suite wall clock)."""
    model, variables, batch, vocab = _make(TINY)
    d = {k: jnp.asarray(v) for k, v in batch.items()}
    return model, variables, d, vocab


@pytest.fixture(scope="module")
def tiny_train_out(tiny):
    model, variables, d, _ = tiny
    return _jit_apply(model)(variables, d, use_tf=True, is_eval=False,
                             train=False)


def test_capnet_forward_train_shapes(tiny):
    cfg = TINY
    model, variables, d, _ = tiny
    out, mutated = _jit_apply(model)(
        variables, d, use_tf=True, is_eval=False, train=True,
        mutable=("batch_stats",))
    B, K = 2, cfg.num_proposals
    assert out["objectness_scores"].shape == (B, K, 2)
    assert out["center"].shape == (B, K, 3)
    assert out["heading_scores"].shape == (B, K, 1)
    assert out["size_scores"].shape == (B, K, 18)
    assert out["size_residuals"].shape == (B, K, 18, 3)
    assert out["sem_cls_scores"].shape == (B, K, 18)
    assert out["bbox_corner"].shape == (B, K, 8, 3)
    assert out["bbox_feature"].shape == (B, K, 128)
    assert out["lang_cap"].shape == (B, cfg.max_des_len + 1, 32)
    assert out["good_bbox_masks"].shape == (B,)
    assert "batch_stats" in mutated


def test_capnet_forward_eval_shapes(tiny):
    cfg = TINY
    model, variables, d, _ = tiny
    out = _jit_apply(model)(variables, d, use_tf=False, is_eval=True,
                            train=False)
    B, K = 2, cfg.num_proposals
    assert out["lang_cap"].shape == (B, K, cfg.max_des_len - 1)  # token ids


def test_capnet_topdown_graph_relation():
    cfg = TINY.__class__(**{**TINY.__dict__,
                            "use_topdown": True, "use_relation": True,
                            "use_orientation": True, "num_graph_steps": 2})
    model, variables, batch, _ = _make(cfg)
    d = {k: jnp.asarray(v) for k, v in batch.items()}
    apply = _jit_apply(model)
    out = apply(variables, d, use_tf=True, is_eval=False, train=False)
    B, K, L = 2, cfg.num_proposals, cfg.num_locals
    assert out["edge_feature"].shape == (B, K, L, 128)
    assert out["edge_orientations"].shape == (B, K, L, cfg.num_bins)
    assert out["edge_distances"].shape == (B, K, L)
    assert out["adjacent_mat"].shape == (B, K, K)
    assert out["lang_cap"].shape == (B, cfg.max_des_len + 1, 32)
    # adjacency rows have exactly num_locals entries
    np.testing.assert_allclose(
        np.asarray(out["adjacent_mat"]).sum(-1), L)
    # eval path with relation
    out = apply(variables, d, use_tf=False, is_eval=True, train=False)
    assert out["lang_cap"].shape == (B, K, cfg.max_des_len - 1)  # token ids


def test_select_target_matches_naive(tiny, tiny_train_out):
    cfg = TINY
    model, variables, d, _ = tiny
    out = tiny_train_out
    ids, ious = select_target(out)
    corners = np.asarray(out["bbox_corner"])
    gt = np.asarray(d["ref_box_corner_label"])
    for b in range(2):
        best, best_iou = 0, -1
        for k in range(cfg.num_proposals):
            mn1, mx1 = corners[b, k].min(0), corners[b, k].max(0)
            mn2, mx2 = gt[b].min(0), gt[b].max(0)
            inter = np.prod(np.maximum(np.minimum(mx1, mx2) - np.maximum(mn1, mn2), 0))
            vol1, vol2 = np.prod(mx1 - mn1), np.prod(mx2 - mn2)
            iou = inter / (vol1 + vol2 - inter + 1e-8)
            if iou > best_iou:
                best, best_iou = k, iou
        assert int(ids[b]) == best
        assert abs(float(ious[b]) - best_iou) < 1e-5


def test_gru_cell_matches_torch():
    torch = pytest.importorskip("torch")
    from scan2cap_tpu.models.layers import GRUCell

    rs = np.random.RandomState(0)
    x = rs.randn(4, 10).astype(np.float32)
    h = rs.randn(4, 20).astype(np.float32)

    cell = GRUCell(20)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))

    tcell = torch.nn.GRUCell(10, 20)
    # copy weights: torch weight_ih (3H, in), flax kernel (in, 3H)
    p = variables["params"]
    with torch.no_grad():
        tcell.weight_ih.copy_(torch.from_numpy(np.asarray(p["ih"]["kernel"]).T))
        tcell.bias_ih.copy_(torch.from_numpy(np.asarray(p["ih"]["bias"])))
        tcell.weight_hh.copy_(torch.from_numpy(np.asarray(p["hh"]["kernel"]).T))
        tcell.bias_hh.copy_(torch.from_numpy(np.asarray(p["hh"]["bias"])))
        want = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    got = np.asarray(cell.apply(variables, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sa_gather_lean_path_matches_grouped_mlp(rng):
    # the SA layer projects source points first and gathers the narrow
    # projection (backbone.py gather-lean path); must equal the grouped
    # raw-feature formulation (pointnet2_modules.py:210-272)
    import jax
    from scan2cap_tpu.models.backbone import PointnetSAModuleVotes
    from scan2cap_tpu.models.layers import SharedMLP
    from scan2cap_tpu.ops import query_and_group
    from scan2cap_tpu.ops.sampling import gather_points

    # C chosen so 3+C > mlp[0] (the gather-lean path's activation condition)
    B, N, C, M, S, R = 2, 500, 40, 64, 16, 0.3
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    mod = PointnetSAModuleVotes(M, R, S, (32, 32, 64))
    v = mod.init(jax.random.PRNGKey(0), xyz, feats, None, False, 0.1)
    _, nf, inds = mod.apply(v, xyz, feats, None, False, 0.1)

    mlp = SharedMLP((32, 32, 64), name="mlp")
    params = {"params": v["params"]["mlp"],
              "batch_stats": v["batch_stats"]["mlp"]}
    new_xyz = gather_points(xyz, inds)
    grouped = query_and_group(xyz, new_xyz, feats, R, S,
                              use_xyz=True, normalize_xyz=True)
    want = jnp.max(mlp.apply(params, grouped, False, 0.1), axis=2)
    np.testing.assert_allclose(np.asarray(nf), np.asarray(want), atol=2e-4)


def test_sa_leaf_inputs_scatter_free_backward(rng):
    # leaf_inputs=True swaps the gather's scatter-add backward for a
    # gather+matmul dW (backbone.py _leaf_gathered_projection); forward and
    # parameter gradients must match the autodiff path
    from scan2cap_tpu.models.backbone import PointnetSAModuleVotes

    B, N, C = 2, 300, 16
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 2)
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    outs, grads = [], []
    for leaf in (False, True):
        mod = PointnetSAModuleVotes(32, 0.4, 8, (8, 8), leaf_inputs=leaf)
        variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)

        def loss(params):
            new_xyz, new_feats, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, feats, train=False)
            return jnp.sum(jnp.sin(new_feats) * 0.1 + new_feats ** 2 * 0.01)

        l, g = jax.value_and_grad(loss)(variables["params"])
        outs.append(float(l))
        grads.append(g)

    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
    flat1 = dict(jax.tree_util.tree_leaves_with_path(grads[1]))
    # convert path keys for lookup
    flat1 = {jax.tree_util.keystr(p): g
             for p, g in jax.tree_util.tree_leaves_with_path(grads[1])}
    for p, g0 in flat0:
        k = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(flat1[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_sa_bf16_compute_keeps_f32_decomposition(rng):
    # compute_dtype=bfloat16 narrows ONLY the post-gather MLP chain
    # (backbone.py fast path): the projection/gather/center-subtract stays
    # f32 (absolute coordinates would quantize in bf16), BN running stats
    # stay f32, and the output tracks the f32 path within bf16 tolerance
    import jax
    from scan2cap_tpu.models.backbone import PointnetSAModuleVotes

    B, N, C, M, S, R = 2, 500, 40, 64, 16, 0.3
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    outs = {}
    for dt in (None, "bfloat16"):
        mod = PointnetSAModuleVotes(M, R, S, (32, 32, 64), compute_dtype=dt)
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, None, False, 0.1)
        for leaf in jax.tree_util.tree_leaves(v["batch_stats"]):
            assert leaf.dtype == jnp.float32
        new_xyz, nf, inds = mod.apply(v, xyz, feats, None, False, 0.1)
        outs[dt] = (np.asarray(new_xyz), np.asarray(nf, np.float32),
                    np.asarray(inds))

    # identical sampling/grouping decisions (the f32 geometry path)
    np.testing.assert_array_equal(outs[None][2], outs["bfloat16"][2])
    np.testing.assert_array_equal(outs[None][0], outs["bfloat16"][0])
    ref = outs[None][1]
    got = outs["bfloat16"][1]
    # bf16 has ~3 decimal digits; activations here are O(1)
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    assert np.mean(np.abs(got - ref)) < 5e-3


def test_bf16_components_gate(rng):
    # the bisection knob (TPU_DESIGN §8): excluding a module from
    # bf16_components must keep that module's output BIT-identical to the
    # all-f32 backbone, while included modules still narrow
    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B, N = 2, 512
    pc = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (B, N, 3)), rng.randn(B, N, 1)],
        axis=-1).astype(np.float32))
    d = {"point_clouds": pc}
    sa_np = (128, 64, 32, 16)

    def run(dtype, comps):
        m = Pointnet2Backbone(1, sa_np, dtype, bf16_components=comps)
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), d, train=False)
        return jax.jit(m.apply, static_argnames=("train",))(
            v, d, train=False)

    f32 = run(None, "sa1,sa2,sa3,sa4,fp")
    part = run("bfloat16", "sa2,sa3,sa4,fp")       # sa1 stays f32

    # excluded module: bit-identical to the all-f32 run
    np.testing.assert_array_equal(np.asarray(f32["sa1_features"]),
                                  np.asarray(part["sa1_features"]))
    # included modules really narrow: sa2 (and everything downstream)
    # departs from f32 (bf16 rounding is real)
    assert not np.array_equal(np.asarray(f32["sa2_features"]),
                              np.asarray(part["sa2_features"]))
    assert not np.array_equal(np.asarray(f32["fp2_features"]),
                              np.asarray(part["fp2_features"]))


def test_storage_dtype_narrows_buffers_not_compute(rng):
    # storage_dtype=bfloat16 rounds ONLY the layer-boundary activation
    # buffers: sampling/grouping geometry is bit-identical to f32, matmul
    # and BN compute stay f32 (params + running stats f32), and the output
    # stays MUCH closer to f32 than the compute-narrowed path because the
    # only error source is per-boundary rounding of O(1) activations
    from scan2cap_tpu.models.backbone import PointnetSAModuleVotes

    B, N, C, M, S, R = 2, 500, 40, 64, 16, 0.3
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    outs = {}
    for st in (None, "bfloat16"):
        mod = PointnetSAModuleVotes(M, R, S, (32, 32, 64), storage_dtype=st)
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, None, False, 0.1)
        for leaf in jax.tree_util.tree_leaves(v):
            assert leaf.dtype == jnp.float32
        new_xyz, nf, inds = mod.apply(v, xyz, feats, None, False, 0.1)
        assert nf.dtype == jnp.float32  # final output cast back wide
        outs[st] = (np.asarray(new_xyz), np.asarray(nf), np.asarray(inds))

    np.testing.assert_array_equal(outs[None][2], outs["bfloat16"][2])
    np.testing.assert_array_equal(outs[None][0], outs["bfloat16"][0])
    ref, got = outs[None][1], outs["bfloat16"][1]
    assert not np.array_equal(got, ref)  # the narrowing is real
    np.testing.assert_allclose(got, ref, atol=0.02, rtol=0.02)
    assert np.mean(np.abs(got - ref)) < 2e-3


def test_storage_dtype_components_gate(rng):
    # storage_dtype shares the bf16_components gate: excluded modules stay
    # bit-identical to the all-f32 backbone
    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B, N = 2, 512
    pc = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (B, N, 3)), rng.randn(B, N, 1)],
        axis=-1).astype(np.float32))
    d = {"point_clouds": pc}
    sa_np = (128, 64, 32, 16)

    def run(st, comps):
        m = Pointnet2Backbone(1, sa_np, None, storage_dtype=st,
                              bf16_components=comps)
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), d, train=False)
        return jax.jit(m.apply, static_argnames=("train",))(
            v, d, train=False)

    f32 = run(None, "sa1,sa2,sa3,sa4,fp")
    part = run("bfloat16", "sa2,sa3,sa4,fp")       # sa1 stays f32

    np.testing.assert_array_equal(np.asarray(f32["sa1_features"]),
                                  np.asarray(part["sa1_features"]))
    assert not np.array_equal(np.asarray(f32["sa2_features"]),
                              np.asarray(part["sa2_features"]))
    # outputs are f32 throughout (storage casts are internal)
    assert part["fp2_features"].dtype == jnp.float32
