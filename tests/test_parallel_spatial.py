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
