"""Unit tests for ops.geometry (SURVEY.md section 4.1: golden geometry tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu.ops import geometry


def ref_norm_angle(a):
    """Literal transcription of the reference normAngle semantics
    (single conditional correction, src/aruco_slam.cpp:412-421)."""
    if a >= np.pi:
        a -= 2 * np.pi
    if a < -np.pi:
        a += 2 * np.pi
    return a


def test_wrap_angle_matches_reference_semantics():
    angles = np.linspace(-3 * np.pi + 1e-6, 3 * np.pi - 1e-6, 1001)
    got = np.asarray(geometry.wrap_angle(jnp.asarray(angles)))
    # Within one wrap of the principal range, single-correction == full wrap.
    for a, g in zip(angles, got):
        if abs(a) < 3 * np.pi - 1e-3:
            assert abs(g - ref_norm_angle(a)) < 1e-6 or abs(abs(g - ref_norm_angle(a)) - 2 * np.pi) < 1e-6


def test_wrap_angle_range():
    angles = jnp.linspace(-2.9 * jnp.pi, 2.9 * jnp.pi, 733)
    w = geometry.wrap_angle_full(angles)
    assert jnp.all(w >= -jnp.pi) and jnp.all(w < jnp.pi)
    np.testing.assert_allclose(np.cos(w), np.cos(angles), atol=1e-5)
    np.testing.assert_allclose(np.sin(w), np.sin(angles), atol=1e-5)


def test_se2_compose_inverse_roundtrip(rng):
    a = rng.uniform(-3, 3, size=(100, 3))
    a[:, 2] = rng.uniform(-np.pi, np.pi, size=100)
    ident = geometry.se2_compose(jnp.asarray(a), geometry.se2_inverse(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_se2_relative_matches_observation_model(rng):
    """se2_relative reproduces the z_hat closed form at src/aruco_slam.cpp:127-134."""
    pose = rng.uniform(-2, 2, size=3)
    lm = rng.uniform(-2, 2, size=3)
    x, y, th = pose
    mx, my, mth = lm
    dx, dy = mx - x, my - y
    dth = ref_norm_angle(mth - th)
    expected = np.array(
        [dx * np.cos(th) + dy * np.sin(th), -dx * np.sin(th) + dy * np.cos(th), dth]
    )
    got = geometry.se2_relative(jnp.asarray(pose), jnp.asarray(lm))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_rodrigues_roundtrip(rng):
    rvecs = rng.normal(size=(200, 3))
    # Include tiny and near-pi magnitudes
    rvecs[0] = [1e-12, 0, 0]
    rvecs[1] = [0, 0, 0]
    rvecs[2] = np.array([1.0, 0.2, -0.3])
    rvecs[2] *= (np.pi - 1e-5) / np.linalg.norm(rvecs[2])
    R = geometry.rodrigues(jnp.asarray(rvecs))
    # Valid rotations
    eye = np.eye(3)
    RtR = np.asarray(jnp.swapaxes(R, -1, -2) @ R)
    np.testing.assert_allclose(RtR, np.broadcast_to(eye, RtR.shape), atol=1e-5)
    back = np.asarray(geometry.inv_rodrigues(R))
    R2 = np.asarray(geometry.rodrigues(jnp.asarray(back)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)  # f32 near pi


def test_rodrigues_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    rvecs = rng.normal(size=(50, 3))
    ours = np.asarray(geometry.rodrigues(jnp.asarray(rvecs)))
    for rv, Ro in zip(rvecs, ours):
        Rcv, _ = cv2.Rodrigues(rv)
        np.testing.assert_allclose(Ro, Rcv, atol=1e-5)


def test_rpy_matches_opencv_composition(rng):
    cv2 = pytest.importorskip("cv2")
    r, p, y = 0.3, -1.2, 2.0
    ours = np.asarray(geometry.rpy_to_matrix(jnp.float64(r), jnp.float64(p), jnp.float64(y)))
    Rx, _ = cv2.Rodrigues(np.array([r, 0, 0]))
    Ry, _ = cv2.Rodrigues(np.array([0, p, 0]))
    Rz, _ = cv2.Rodrigues(np.array([0, 0, y]))
    np.testing.assert_allclose(ours, Rz @ Ry @ Rx, atol=1e-5)


def test_homography_exact_on_4pts(rng):
    src = rng.uniform(-1, 1, size=(4, 2))
    H_true = np.array([[1.2, 0.1, 0.3], [-0.2, 0.9, -0.1], [0.05, -0.03, 1.0]])
    ph = np.concatenate([src, np.ones((4, 1))], axis=-1) @ H_true.T
    dst = ph[:, :2] / ph[:, 2:3]
    H = np.asarray(geometry.homography_from_4pts(jnp.asarray(src), jnp.asarray(dst)))
    mapped = np.asarray(
        geometry.apply_homography(jnp.asarray(H), jnp.asarray(src))
    )
    np.testing.assert_allclose(mapped, dst, atol=1e-4)


def test_jit_and_vmap_compatible():
    f = jax.jit(jax.vmap(geometry.rodrigues))
    out = f(jnp.zeros((8, 3)))
    assert out.shape == (8, 3, 3)


def test_inv_rodrigues_near_pi_exhaustive(rng):
    """Regression: the near-pi band used to break three ways — wrong axis
    signs from a single off-diagonal pair (e.g. axis (0, b, -b)), f32 arccos
    catastrophe near trace=-1, and the theta-sign ambiguity just below pi."""
    cases = [np.pi * np.array([0, 1, -1]) / np.sqrt(2)]
    for _ in range(300):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        cases.append(v * (np.pi - abs(rng.normal(scale=4e-3))))
    worst = 0.0
    for rv in cases:
        R = geometry.rodrigues(jnp.asarray(rv, jnp.float32))
        R2 = geometry.rodrigues(geometry.inv_rodrigues(R))
        worst = max(worst, float(jnp.abs(R2 - R).max()))
    assert worst < 5e-4, worst
