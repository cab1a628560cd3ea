"""Point-axis sharding: the sharded SA ops must equal the unsharded ops
index-for-index on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.ops.grouping import ball_query, query_and_group
from scan2cap_tpu.parallel.mesh import make_mesh
from scan2cap_tpu.parallel.spatial import (
    ball_query_sharded, query_and_group_sharded)


def test_ball_query_point_sharded_exact(rng):
    mesh = make_mesh(n_data=2, n_model=4)
    xyz = jnp.asarray(rng.rand(2, 600, 3).astype(np.float32) * 3)
    new_xyz = xyz[:, :64]

    want = np.asarray(ball_query(xyz, new_xyz, 0.5, 8))
    got = np.asarray(jax.jit(
        lambda a, b: ball_query_sharded(a, b, 0.5, 8, mesh))(xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


def test_query_and_group_point_sharded_exact(rng):
    mesh = make_mesh(n_data=1, n_model=8)
    xyz = jnp.asarray(rng.rand(1, 400, 3).astype(np.float32) * 2)
    feats = jnp.asarray(rng.randn(1, 400, 6).astype(np.float32))
    new_xyz = xyz[:, :32]

    want = np.asarray(query_and_group(
        xyz, new_xyz, feats, radius=0.4, nsample=8,
        use_xyz=True, normalize_xyz=True))
    got = np.asarray(jax.jit(lambda a, b, f: query_and_group_sharded(
        a, b, f, 0.4, 8, mesh, use_xyz=True, normalize_xyz=True))(
            xyz, new_xyz, feats))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_spatial_dp_mesh_no_data_collectives(rng):
    """Production composition (train.py --mesh DATA,MODEL --spatial): on a
    ("data", "model") mesh the wrappers shard the SCENE axis over "data"
    (parallel/spatial._batch_axis), so batch-sharded activations enter the
    shard_map without a data-axis all-gather — the compiled ball query has
    ZERO collectives (each device scans its B/n_data scenes, query shard
    stays resident) and the result is exact."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=2, n_model=4)
    B, N, M = 4, 512, 64
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 3)
    new_xyz = xyz[:, :M]
    want = np.asarray(ball_query(xyz, new_xyz, 0.5, 8))

    data_s = NamedSharding(mesh, P("data"))
    xyz_s = jax.device_put(xyz, data_s)
    q_s = jax.device_put(new_xyz, data_s)
    fn = jax.jit(lambda a, b: ball_query_sharded(a, b, 0.5, 8, mesh))
    np.testing.assert_array_equal(np.asarray(fn(xyz_s, q_s)), want)

    hlo = fn.lower(xyz_s, q_s).compile().as_text()
    colls = re.findall(
        r"(all-gather|all-reduce|all-to-all|collective-permute)-start", hlo)
    assert not colls, colls


def test_backbone_spatial_axis_dp_mesh_exact(rng):
    """The exact train.py --mesh 4,2 --spatial path: ambient
    ("data", "model") mesh, batch sharded P("data"), SA query axes over
    "model" — indices and features reproduce the unsharded backbone."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B, N = 4, 512
    pc = jnp.asarray(
        np.concatenate([rng.rand(B, N, 3) * 4 - 2,
                        rng.randn(B, N, 2) * 0.1], axis=-1).astype(np.float32))
    sa_np = (64, 32, 16, 16)

    plain = Pointnet2Backbone(2, sa_np)
    sharded = Pointnet2Backbone(2, sa_np, spatial_axis="model")
    variables = jax.jit(plain.init, static_argnums=(2,))(
        jax.random.PRNGKey(2), {"point_clouds": pc}, False)
    want = jax.jit(lambda v, b: plain.apply(v, b, False))(
        variables, {"point_clouds": pc})

    mesh = make_mesh(n_data=2, n_model=4)
    pc_s = jax.device_put(pc, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        # init must trace under the ambient mesh too (the train.py
        # create_train_state contract)
        jax.jit(sharded.init, static_argnums=(2,))(
            jax.random.PRNGKey(2), {"point_clouds": pc_s}, False)
        got = jax.jit(lambda v, b: sharded.apply(v, b, False))(
            variables, {"point_clouds": pc_s})

    for k in ("sa1_inds", "sa2_inds", "fp2_inds"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)
    for k in ("sa1_features", "fp2_features"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def _spatial_mesh():
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:8]), ("spatial",))


def test_backbone_spatial_axis_exact(rng):
    """ModelConfig.spatial_axis (VERDICT r4 #3): the backbone with every SA
    layer's query axis sharded over an ambient ("spatial",) mesh reproduces
    the unsharded backbone — FPS/ball-query indices EXACTLY (integers;
    replicate-then-shard), features to f32-tiling tolerance."""
    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B, N = 2, 512
    pc = jnp.asarray(
        np.concatenate([rng.rand(B, N, 3) * 4 - 2,
                        rng.randn(B, N, 2) * 0.1], axis=-1).astype(np.float32))
    batch = {"point_clouds": pc}
    sa_np = (64, 32, 16, 16)

    plain = Pointnet2Backbone(2, sa_np)
    sharded = Pointnet2Backbone(2, sa_np, spatial_axis="spatial")
    variables = jax.jit(plain.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), batch, False)

    want = jax.jit(lambda v, b: plain.apply(v, b, False))(variables, batch)
    mesh = _spatial_mesh()
    with jax.set_mesh(mesh):
        got = jax.jit(lambda v, b: sharded.apply(v, b, False))(variables, batch)

    for k in ("sa1_inds", "sa2_inds", "fp2_inds"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)
    for k in ("sa1_features", "sa4_features", "fp2_features"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_backbone_spatial_axis_grads_match(rng):
    """Backward through the shard_map wrappers (check_vma=False transposes:
    replicated-table cotangents must be psummed — incl. the sa1 custom-VJP
    dW path): gradients match the unsharded backbone within f32
    reassociation tolerance."""
    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B, N = 2, 256
    pc = jnp.asarray(
        np.concatenate([rng.rand(B, N, 3) * 4 - 2,
                        rng.randn(B, N, 2) * 0.1], axis=-1).astype(np.float32))
    batch = {"point_clouds": pc}
    sa_np = (32, 16, 16, 16)

    plain = Pointnet2Backbone(2, sa_np)
    sharded = Pointnet2Backbone(2, sa_np, spatial_axis="spatial")
    variables = jax.jit(plain.init, static_argnums=(2,))(
        jax.random.PRNGKey(1), batch, False)
    params, stats = variables["params"], variables["batch_stats"]

    def loss(model):
        def f(p):
            out, _ = model.apply({"params": p, "batch_stats": stats}, batch,
                                 True, 0.1, mutable=["batch_stats"])
            return jnp.sum(out["fp2_features"] ** 2) * 1e-3
        return f

    want_l, want_g = jax.jit(jax.value_and_grad(loss(plain)))(params)
    mesh = _spatial_mesh()
    with jax.set_mesh(mesh):
        got_l, got_g = jax.jit(jax.value_and_grad(loss(sharded)))(params)

    def check(got_l, got_g):
        assert abs(float(got_l) - float(want_l)) <= 1e-4 * abs(float(want_l))
        flat_w = jax.tree_util.tree_flatten_with_path(want_g)[0]
        flat_g = jax.tree_util.tree_flatten_with_path(got_g)[0]
        gmax = max(float(jnp.max(jnp.abs(a))) for _, a in flat_w)
        for (pw, a), (_, b) in zip(flat_w, flat_g):
            d = float(jnp.max(jnp.abs(a - b)))
            # 8-shard BN-stat psums reorder f32 sums (measured ~1.6e-4 of
            # the grad max on the bn biases); a dropped psum would be O(1)
            # off
            assert d <= 5e-4 * gmax, (jax.tree_util.keystr(pw), d, gmax)

    check(got_l, got_g)

    # production composition: ("data", "model") mesh with the batch sharded
    # over "data" — the _batch_axis specs must psum the replicated-table
    # cotangents over "model" ONLY (cat/xyz are per-scene) and w0's over
    # both axes
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp_mesh = make_mesh(n_data=2, n_model=4)
    dp_model = Pointnet2Backbone(2, sa_np, spatial_axis="model")
    pc_s = jax.device_put(pc, NamedSharding(dp_mesh, P("data")))

    def loss_dp(p):
        out, _ = dp_model.apply({"params": p, "batch_stats": stats},
                                {"point_clouds": pc_s}, True, 0.1,
                                mutable=["batch_stats"])
        return jnp.sum(out["fp2_features"] ** 2) * 1e-3

    with jax.set_mesh(dp_mesh):
        dp_l, dp_g = jax.jit(jax.value_and_grad(loss_dp))(params)
    check(dp_l, dp_g)


def test_spatial_axis_named_data_stays_valid(rng):
    """Sharding the QUERY axis over an axis literally named "data" must not
    emit P("data", "data", ...) (a PartitionSpec cannot name one mesh axis
    twice): _batch_axis falls back to a replicated scene axis and the
    result stays exact."""
    mesh = make_mesh(n_data=4, n_model=2)
    xyz = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32) * 3)
    new_xyz = xyz[:, :64]

    want = np.asarray(ball_query(xyz, new_xyz, 0.5, 8))
    got = np.asarray(jax.jit(lambda a, b: ball_query_sharded(
        a, b, 0.5, 8, mesh, axis="data"))(xyz, new_xyz))
    np.testing.assert_array_equal(got, want)


def test_spatial_axis_requires_ambient_mesh():
    import pytest

    from scan2cap_tpu.parallel.spatial import ball_query_sharded

    xyz = jnp.zeros((1, 64, 3))
    with pytest.raises(ValueError, match="spatial"):
        ball_query_sharded(xyz, xyz[:, :8], 0.3, 4, axis="spatial")
