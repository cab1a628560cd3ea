"""ENet encoder + projection helper tests."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.models.enet import ENetEncoder, ENetClassifier
from scan2cap_tpu.data.projection import (
    ProjectionHelper, SCANNET_INTRINSICS, PROJECTOR_IMAGE_DIMS,
    DEPTH_MIN, DEPTH_MAX, PROJECTION_ACCURACY)


def test_enet_trunk_shapes():
    model = ENetEncoder()
    x = jnp.zeros((1, 64, 80, 3))
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, x, train=False)
    assert out.shape == (1, 8, 10, 128)   # 1/8 resolution, 128 channels


def test_enet_classifier():
    model = ENetClassifier(num_classes=41)
    x = jnp.zeros((1, 32, 40, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    feat, logits = jax.jit(model.apply, static_argnames=("train",))(
        variables, x, train=False)
    assert feat.shape == (1, 4, 5, 128)
    assert logits.shape == (1, 4, 5, 41)


def _projector():
    return ProjectionHelper(SCANNET_INTRINSICS, DEPTH_MIN, DEPTH_MAX,
                            PROJECTOR_IMAGE_DIMS, PROJECTION_ACCURACY)


def test_projection_identity_camera():
    proj = _projector()
    # points straight ahead of an identity camera within depth range
    zs = np.array([0.5, 1.0, 2.0, 3.0])
    pts = np.stack([np.zeros(4), np.zeros(4), zs], 1)
    # center pixel for (0,0,z): u=cx=20, v=cy=15.5 -> rounds to (20, 16)
    w, h = PROJECTOR_IMAGE_DIMS
    depth = np.zeros((h, w), np.float32)
    depth[:] = 100.0
    depth[16, 20] = 1.0
    res = proj.compute_projection(pts, depth, np.eye(4))
    assert res is not None
    ind3d, ind2d = res
    n = ind3d[0]
    # only the z=1.0 point passes the depth consistency check
    assert n == 1
    assert ind3d[1] == 1
    assert ind2d[1] == 16 * w + 20


def test_projection_scatter():
    proj = _projector()
    w, h = PROJECTOR_IMAGE_DIMS
    feats = np.arange(2 * h * w, dtype=np.float32).reshape(2, h, w)
    ind3d = np.zeros(6, np.int64)
    ind2d = np.zeros(6, np.int64)
    ind3d[0] = ind2d[0] = 2
    ind3d[1:3] = [4, 1]
    ind2d[1:3] = [0, h * w - 1]
    out = proj.project(feats, ind3d, ind2d, 5)
    assert out.shape == (2, 5)
    assert out[0, 4] == feats[0].reshape(-1)[0]
    assert out[1, 1] == feats[1].reshape(-1)[-1]
    assert out[0, 0] == 0


def test_frustum_culling():
    proj = _projector()
    corners = proj.compute_frustum_corners(np.eye(4))
    normals = proj.compute_frustum_normals(corners)
    pts = np.array([
        [0, 0, 1.0],     # inside
        [0, 0, 10.0],    # beyond depth_max
        [0, 0, -1.0],    # behind camera
        [100, 0, 1.0],   # far off to the side
    ])
    mask = proj.points_in_frustum(corners, normals, pts)
    assert mask[0]
    assert not mask[1] and not mask[2] and not mask[3]
