"""Native C++ data plane vs the numpy reference loops (lib/dataset.py
__getitem__ semantics).  Skips build-dependent checks if g++ is unavailable
(the fallbacks are still exercised)."""

import numpy as np
import pytest

from scan2cap_tpu import native


def _ref_votes(xyz, inst, care):
    m = xyz.shape[0]
    votes = np.zeros((m, 3), np.float32)
    mask = np.zeros((m,), np.float32)
    for i_instance in np.unique(inst):
        ind = np.where(inst == i_instance)[0]
        if i_instance < 0 or not care[ind[0]]:
            continue
        x = xyz[ind, :3].astype(np.float32)
        center = np.float32(0.5) * (x.min(0) + x.max(0))
        votes[ind] = center - x
        mask[ind] = 1.0
    return votes, mask


def test_native_builds():
    assert native.available(), "g++ build of dataplane.cc failed"


def test_sample_gather(rng):
    pts = rng.randn(5000, 7).astype(np.float32)
    idx = rng.randint(0, 5000, size=2048)
    got = native.sample_gather(pts, idx)
    np.testing.assert_array_equal(got, pts[idx])


def test_augment_points(rng):
    pc = rng.randn(4096, 5).astype(np.float32)
    rot = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    trans = rng.randn(3).astype(np.float32)
    got = native.augment_points(pc, True, False, rot, trans)
    xyz = pc[:, :3].copy()
    xyz[:, 0] = -xyz[:, 0]
    want = xyz @ rot.T + trans
    np.testing.assert_allclose(got[:, :3], want, atol=1e-5)
    np.testing.assert_array_equal(got[:, 3:], pc[:, 3:])  # features untouched


def test_point_votes_first_point_gate(rng):
    m = 3000
    xyz = rng.randn(m, 3).astype(np.float32)
    inst = rng.randint(0, 40, size=m).astype(np.int32)
    inst[::17] = -1                          # unlabeled points
    # per-point care flags that DISAGREE within instances: the gate must use
    # the first point's flag only
    care = (rng.rand(m) > 0.5).astype(np.uint8)
    got_v, got_m = native.point_votes(xyz, inst, care)
    want_v, want_m = _ref_votes(xyz, inst, care)
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_allclose(got_v, want_v, atol=1e-6)


def test_point_votes_empty_and_single():
    xyz = np.zeros((0, 3), np.float32)
    v, m = native.point_votes(xyz, np.zeros((0,), np.int32),
                              np.zeros((0,), np.uint8))
    assert v.shape == (0, 3) and m.shape == (0,)
    xyz = np.array([[1.0, 2.0, 3.0]], np.float32)
    v, m = native.point_votes(xyz, np.array([0], np.int32),
                              np.array([1], np.uint8))
    np.testing.assert_allclose(v, [[0, 0, 0]])   # center of a single point
    np.testing.assert_array_equal(m, [1.0])


def test_fallback_matches_native(rng, monkeypatch):
    # force the numpy fallback and compare against the native result
    if not native.available():
        pytest.skip("native lib unavailable")
    pts = rng.randn(1000, 4).astype(np.float32)
    idx = rng.randint(0, 1000, size=256)
    nat = native.sample_gather(pts, idx)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    fb = native.sample_gather(pts, idx)
    np.testing.assert_array_equal(nat, fb)
