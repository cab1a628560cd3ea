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


def _clip_poly_np(subject, clip):
    """Clean-room Sutherland-Hodgman (ccw convex clip), float64."""
    out = [np.asarray(v, float) for v in subject]
    cp1 = np.asarray(clip[-1], float)
    for cp2 in np.asarray(clip, float):
        inp, out = out, []
        if not inp:
            break
        s = inp[-1]
        for e in inp:
            d = cp2 - cp1
            in_e = d[0] * (e[1] - cp1[1]) > d[1] * (e[0] - cp1[0])
            in_s = d[0] * (s[1] - cp1[1]) > d[1] * (s[0] - cp1[0])
            if in_e != in_s:
                dc, dp = cp1 - cp2, s - e
                n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
                n2 = s[0] * e[1] - s[1] * e[0]
                n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
                out.append(np.array([(n1 * dp[0] - n2 * dc[0]) * n3,
                                     (n1 * dp[1] - n2 * dc[1]) * n3]))
            if in_e:
                out.append(e)
            s = e
        cp1 = cp2
    return out


def _shoelace(poly):
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def _rot_corners(center, size, heading):
    """Z-up rotated box corners in the reference corner order."""
    l, w, h = size
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * l / 2
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * w / 2
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * h / 2
    c, s = np.cos(heading), np.sin(heading)
    x = c * sx + s * sy
    y = -s * sx + c * sy
    return np.stack([x, y, sz], 1) + np.asarray(center)


def test_rotated_giou_matches_numpy_clipper(rng):
    from scan2cap_tpu.ops.boxes import generalized_box3d_iou_rotated

    boxes1 = [_rot_corners(rng.rand(3) * 2, rng.rand(3) * 1.5 + 0.5,
                           rng.rand() * np.pi) for _ in range(6)]
    boxes2 = [_rot_corners(rng.rand(3) * 2, rng.rand(3) * 1.5 + 0.5,
                           rng.rand() * np.pi) for _ in range(5)]
    c1 = np.stack(boxes1).astype(np.float32)
    c2 = np.stack(boxes2).astype(np.float32)

    got = np.asarray(generalized_box3d_iou_rotated(
        jnp.asarray(c1), jnp.asarray(c2)))

    EPS = 1e-8
    for i in range(len(boxes1)):
        for j in range(len(boxes2)):
            r1 = c1[i][(3, 2, 1, 0), :2]
            r2 = c2[j][(3, 2, 1, 0), :2]
            lt = np.maximum(r1[1], r2[1])
            rb = np.minimum(r1[3], r2[3])
            wh = np.maximum(rb - lt, 0)
            inter_area = (_shoelace(_clip_poly_np(r1, r2))
                          if wh[0] * wh[1] > 0 else 0.0)
            height = max(min(c1[i][0, 2], c2[j][0, 2])
                         - max(c1[i][4, 2], c2[j][4, 2]), 0.0)
            inter = inter_area * height

            def vol(c):
                a = np.linalg.norm(c[0] - c[1])
                b = np.linalg.norm(c[1] - c[2])
                h = np.linalg.norm(c[0] - c[4])
                return a * b * h
            sum_vols = vol(c1[i]) + vol(c2[j])
            lo = np.minimum(c1[i].min(0), c2[j].min(0))
            hi = np.maximum(c1[i].max(0), c2[j].max(0))
            enc = np.prod(hi - lo)
            union = max(sum_vols - inter, EPS)
            want = inter / union - (1 - union / enc)
            np.testing.assert_allclose(got[i, j], want, rtol=2e-4, atol=2e-4)


def test_rotated_giou_axis_aligned_cases():
    from scan2cap_tpu.ops.boxes import (
        generalized_box3d_iou_aabb, generalized_box3d_iou_rotated)

    c1 = np.stack([_rot_corners([0, 0, 0], [2, 2, 2], 0.0),
                   _rot_corners([5, 5, 5], [1, 1, 1], 0.0)]).astype(np.float32)
    c2 = np.stack([_rot_corners([0.5, 0, 0], [2, 2, 2], 0.0),
                   _rot_corners([0, 0, 0], [2, 2, 2], 0.0)]).astype(np.float32)
    rot = np.asarray(generalized_box3d_iou_rotated(
        jnp.asarray(c1), jnp.asarray(c2)))
    ab = np.asarray(generalized_box3d_iou_aabb(
        jnp.asarray(c1), jnp.asarray(c2)))
    # identical box pair -> gIoU 1; heading-0 boxes agree with the AABB path
    np.testing.assert_allclose(rot[0, 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(rot[0, 0], ab[0, 0], atol=1e-4)
    # disjoint pair: IoU 0, pure enclosing penalty (negative)
    assert rot[1, 1] < 0
