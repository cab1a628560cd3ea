"""Pallas FPS kernel parity (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import jax.numpy as jnp

from scan2cap_tpu.ops.pallas.fps import furthest_point_sample_pallas
from scan2cap_tpu.ops.sampling import _furthest_point_sample_xla


def test_pallas_fps_matches_xla(rng):
    xyz = rng.randn(2, 1300, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 64, interpret=True))
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 64))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_skips_padding(rng):
    xyz = rng.randn(1, 500, 3).astype(np.float32) + 3.0
    xyz[:, 300:] = 0.0  # zero padding must never be selected
    got = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 32, interpret=True))
    assert got.max() < 300
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_all_invalid_scene(rng):
    # A scene of ALL zero points (||p||^2 <= 1e-3 skip) pins the -1 sentinel
    # temp init: every score stays -1, argmax resolves to index 0 each
    # iteration, output all zeros — mixed into a batch with a normal scene.
    xyz = rng.randn(2, 400, 3).astype(np.float32) + 2.0
    xyz[1] = 0.0
    got = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 16, interpret=True))
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 16))
    np.testing.assert_array_equal(got, want)
    assert (got[1] == 0).all()


def test_pallas_fps_fold_valid_variants_agree(rng):
    # the fold_valid=False arm is the pre-tuning two-pass kernel kept for
    # the on-device A/B (scripts/micro_fps.py); both must be exact
    xyz = rng.randn(3, 700, 3).astype(np.float32)
    xyz[1, 400:] = 0.0  # mix of zero-padding and valid points
    a = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, fold_valid=True))
    b = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, fold_valid=False))
    np.testing.assert_array_equal(a, b)
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 48))
    np.testing.assert_array_equal(a, want)


def test_pallas_fps_pair_argmax_variant_agrees(rng):
    # pair_argmax=True collapses the max-scan -> mask -> min-scan chain to
    # one (score, index) scan; must be bit-identical, incl. tie-breaks and
    # the all-invalid-scene path (scripts/micro_fps.py A/Bs it on device)
    xyz = rng.randn(3, 700, 3).astype(np.float32)
    xyz[1, 400:] = 0.0
    xyz[2] = 0.0  # all-invalid scene
    # quantized coords force genuine score ties across rows of a group
    xyz[0] = np.round(xyz[0] * 2.0) / 2.0
    a = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, pair_argmax=True))
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 48))
    np.testing.assert_array_equal(a, want)
    b = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, pair_argmax=True,
        fold_valid=False))
    np.testing.assert_array_equal(b, want)


def test_pallas_fps_carry_coords_variant_agrees(rng):
    # carry_coords=True threads the winner's coordinates through the argmax
    # scan (coords must follow the tie-broken index bit-exactly), replacing
    # the per-iteration one-hot + add-scan extraction
    xyz = rng.randn(3, 700, 3).astype(np.float32)
    xyz[1, 400:] = 0.0
    xyz[2] = 0.0  # all-invalid scene
    xyz[0] = np.round(xyz[0] * 2.0) / 2.0  # force cross-row score ties
    a = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, carry_coords=True))
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 48))
    np.testing.assert_array_equal(a, want)
    b = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True, carry_coords=True,
        fold_valid=False))
    np.testing.assert_array_equal(b, want)


def test_pallas_fps_multi_program(rng):
    # B > 8 exercises the multi-scene grid (8 scenes/program, 2 programs)
    xyz = rng.randn(10, 1100, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample_pallas(
        jnp.asarray(xyz), 48, interpret=True))
    want = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 48))
    np.testing.assert_array_equal(got, want)
