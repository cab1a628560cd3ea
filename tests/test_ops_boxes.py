"""Tests for box geometry + nn_distance (utils/box_util.py, utils/nn_distance.py)."""

import numpy as np
import jax.numpy as jnp

from scan2cap_tpu.ops import (
    get_3d_box_batch, box3d_iou_batch, nn_distance, huber_loss,
)
from scan2cap_tpu.ops.boxes import box3d_iou_matrix, generalized_box3d_iou_aabb


def get_3d_box_numpy(box_size, heading, center):
    l, w, h = box_size
    c, s = np.cos(heading), np.sin(heading)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    x = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * l / 2
    y = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * w / 2
    z = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * h / 2
    return (R @ np.vstack([x, y, z])).T + center


def test_corner_construction(rng):
    sizes = rng.rand(4, 3).astype(np.float32) + 0.5
    centers = rng.randn(4, 3).astype(np.float32)
    headings = np.zeros(4, np.float32)
    got = np.asarray(get_3d_box_batch(
        jnp.asarray(sizes), jnp.asarray(headings), jnp.asarray(centers)))
    for i in range(4):
        want = get_3d_box_numpy(sizes[i], 0.0, centers[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_corner_construction_rotated(rng):
    size = np.array([2.0, 1.0, 0.5], np.float32)
    center = np.array([1.0, -2.0, 0.3], np.float32)
    got = np.asarray(get_3d_box_batch(
        jnp.asarray(size), jnp.asarray(0.7, dtype=jnp.float32), jnp.asarray(center)))
    want = get_3d_box_numpy(size, 0.7, center)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _aabb_corners(lo, hi):
    lo, hi = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
    size = hi - lo
    center = (hi + lo) / 2
    return get_3d_box_numpy(size, 0.0, center)


def test_iou_known_value():
    a = _aabb_corners([0, 0, 0], [2, 2, 2])       # vol 8
    b = _aabb_corners([1, 1, 1], [3, 3, 3])       # vol 8, intersection 1
    iou = float(box3d_iou_batch(jnp.asarray(a[None]), jnp.asarray(b[None]))[0])
    assert abs(iou - 1.0 / 15.0) < 1e-5
    self_iou = float(box3d_iou_batch(jnp.asarray(a[None]), jnp.asarray(a[None]))[0])
    assert abs(self_iou - 1.0) < 1e-5


def test_iou_matrix(rng):
    boxes = []
    for _ in range(5):
        lo = rng.rand(3)
        boxes.append(_aabb_corners(lo, lo + rng.rand(3) + 0.1))
    boxes = np.stack(boxes).astype(np.float32)
    mat = np.asarray(box3d_iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(5):
        for j in range(5):
            want = float(box3d_iou_batch(
                jnp.asarray(boxes[i][None]), jnp.asarray(boxes[j][None]))[0])
            assert abs(mat[i, j] - want) < 1e-5
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-5)


def test_generalized_iou_disjoint():
    a = _aabb_corners([0, 0, 0], [1, 1, 1])
    b = _aabb_corners([2, 0, 0], [3, 1, 1])
    g = float(generalized_box3d_iou_aabb(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    # enclosing box vol 3, union 2 -> gIoU = 0 - 1/3
    assert abs(g + 1.0 / 3.0) < 1e-5


def test_nn_distance(rng):
    pc1 = rng.rand(1, 5, 3).astype(np.float32)
    pc2 = rng.rand(1, 6, 3).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
    dist = ((pc1[0][:, None] - pc2[0][None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1)[0], dist.min(1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[0], dist.argmin(1))
    np.testing.assert_allclose(np.asarray(d2)[0], dist.min(0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2)[0], dist.argmin(0))


def test_nn_distance_l1_and_huber(rng):
    pc1 = rng.rand(1, 4, 3).astype(np.float32)
    pc2 = rng.rand(1, 4, 3).astype(np.float32)
    d1, _, _, _ = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2), l1=True)
    dist = np.abs(pc1[0][:, None] - pc2[0][None]).sum(-1)
    np.testing.assert_allclose(np.asarray(d1)[0], dist.min(1), rtol=1e-5)

    err = np.linspace(-3, 3, 13).astype(np.float32)
    h = np.asarray(huber_loss(jnp.asarray(err), delta=1.0))
    want = np.where(np.abs(err) <= 1, 0.5 * err ** 2, 0.5 + (np.abs(err) - 1))
    np.testing.assert_allclose(h, want, rtol=1e-5)
