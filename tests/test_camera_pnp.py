"""Tests for the camera model and square PnP against synthetic projections
and (when available) OpenCV golden values (SURVEY.md section 4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu.ops import geometry, pnp
from aruco_slam_tpu.ops.camera import (
    CameraIntrinsics,
    distort_normalized,
    pixels_to_normalized,
    project_points,
    transform_points,
    undistort_normalized,
)

CAM = CameraIntrinsics.create(500.0, 505.0, 320.0, 240.0,
                              dist=[-0.2, 0.05, 0.001, -0.0005, 0.01])
CAM_NODIST = CameraIntrinsics.create(500.0, 505.0, 320.0, 240.0)
MARKER_LEN = 0.27


def make_pose(rng, dist_range=(0.5, 2.5)):
    """Random marker pose in front of the camera, facing it."""
    rvec = np.concatenate(
        [rng.uniform(-0.4, 0.4, size=2) + [np.pi * 0.0, 0.0], rng.uniform(-0.5, 0.5, size=1)]
    )
    # Base orientation: marker plane roughly facing camera (z toward camera)
    base = np.array([np.pi, 0.0, 0.0]) + rvec * 0.5
    tvec = np.array(
        [rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), rng.uniform(*dist_range)]
    )
    return base, tvec


def project_marker(rvec, tvec, camera):
    obj = pnp.marker_object_points(MARKER_LEN, dtype=jnp.float32)
    R = geometry.rodrigues(jnp.asarray(rvec, jnp.float32))
    pc = transform_points(R, jnp.asarray(tvec, jnp.float32), obj)
    return project_points(pc, camera)


def test_undistort_inverts_distort(rng):
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(100, 2)), jnp.float32)
    d = distort_normalized(pts, CAM.dist)
    back = undistort_normalized(d, CAM.dist, iters=10)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_project_matches_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    obj = np.asarray(pnp.marker_object_points(MARKER_LEN), np.float64)
    rvec, tvec = make_pose(rng)
    K = np.asarray(CAM.matrix, np.float64)
    dist = np.asarray(CAM.dist, np.float64)
    expected, _ = cv2.projectPoints(obj, rvec, tvec, K, dist)
    got = project_marker(rvec, tvec, CAM)
    np.testing.assert_allclose(np.asarray(got), expected[:, 0, :], atol=5e-2)


def test_pnp_recovers_pose_no_noise(rng):
    for _ in range(20):
        rvec, tvec = make_pose(rng)
        corners = project_marker(rvec, tvec, CAM)
        res = pnp.solve_pnp_square(corners, CAM, MARKER_LEN)
        np.testing.assert_allclose(np.asarray(res.tvec), tvec, atol=2e-3)
        R_true = np.asarray(geometry.rodrigues(jnp.asarray(rvec, jnp.float32)))
        R_est = np.asarray(geometry.rodrigues(res.rvec))
        np.testing.assert_allclose(R_est, R_true, atol=2e-2)
        assert float(res.rms_px) < 1e-2


def test_pnp_batch_vmap(rng):
    corners = []
    for _ in range(6):
        rv, tv = make_pose(rng)
        corners.append(np.asarray(project_marker(rv, tv, CAM)))
    batch = jnp.asarray(np.stack(corners))
    res = jax.jit(
        lambda c: pnp.solve_pnp_square_batch(c, CAM, MARKER_LEN, 10)
    )(batch)
    assert res.rvec.shape == (6, 3)
    assert np.all(np.asarray(res.rms_px) < 0.1)


def test_pnp_close_to_opencv(rng):
    cv2 = pytest.importorskip("cv2")
    obj = np.asarray(pnp.marker_object_points(MARKER_LEN), np.float64)
    K = np.asarray(CAM.matrix, np.float64)
    dist = np.asarray(CAM.dist, np.float64)
    for _ in range(10):
        rvec, tvec = make_pose(rng)
        corners = np.asarray(project_marker(rvec, tvec, CAM), np.float64)
        ok, rv_cv, tv_cv = cv2.solvePnP(
            obj, corners.reshape(-1, 1, 2), K, dist, flags=cv2.SOLVEPNP_IPPE_SQUARE
        )
        assert ok
        res = pnp.solve_pnp_square(jnp.asarray(corners, jnp.float32), CAM, MARKER_LEN)
        np.testing.assert_allclose(np.asarray(res.tvec), tv_cv[:, 0], atol=5e-3)


def test_observation_covariance_matches_reference_formula(rng):
    """Check against a literal transcription of CalculateCovariance
    (src/aruco_slam.cpp:437-471)."""
    rvec, tvec = make_pose(rng)
    corners_true = np.asarray(project_marker(rvec, tvec, CAM))
    noisy = corners_true + rng.normal(scale=0.5, size=corners_true.shape)
    res = pnp.solve_pnp_square(jnp.asarray(noisy, jnp.float32), CAM, MARKER_LEN)
    R_x, R_y, R_theta = 100.0, 100.0, 10.0
    cov = np.asarray(
        pnp.observation_covariance(
            res.rms_px, res.tvec, jnp.asarray(noisy, jnp.float32),
            MARKER_LEN, R_x, R_y, R_theta,
        )
    )
    # Reference transcription
    R_est = np.asarray(geometry.rodrigues(res.rvec))
    obj = np.asarray(pnp.marker_object_points(MARKER_LEN))
    proj = np.asarray(
        project_points(
            transform_points(jnp.asarray(R_est), res.tvec, jnp.asarray(obj)), CAM
        )
    )
    total = sum(np.sum((noisy[i] - proj[i]) ** 2) for i in range(4))
    rmserror = total / 4.0
    object_error = (rmserror / np.linalg.norm(noisy[0] - noisy[2])) * (
        np.linalg.norm(np.asarray(res.tvec)) / MARKER_LEN
    )
    expected = np.diag(
        [object_error * R_x + 1e-2, object_error * R_y + 1e-2, object_error * R_theta + 1e-3]
    )
    np.testing.assert_allclose(cov, expected, rtol=1e-3, atol=1e-5)


def test_camera_observation_axis_convention():
    """x = tvec_z + tx, y = -tvec_x + ty, theta = atan2(-R02, R22)
    (src/aruco_slam.cpp:359-362)."""
    rvec = jnp.asarray([np.pi, 0.0, 0.0], jnp.float32)  # marker facing camera
    tvec = jnp.asarray([0.5, 0.1, 2.0], jnp.float32)
    t_r2c = jnp.asarray([0.07, 0.02], jnp.float32)
    obs = pnp.camera_observation_to_robot(rvec, tvec, t_r2c)
    R = np.asarray(geometry.rodrigues(rvec))
    expected_theta = np.arctan2(-R[0, 2], R[2, 2])
    np.testing.assert_allclose(
        np.asarray(obs), [2.0 + 0.07, -0.5 + 0.02, expected_theta], atol=1e-5
    )


def test_from_camera_info():
    """CameraInfo-style construction (reference parseCameraInfo semantics:
    9-float K row-major, D padded/truncated to 5)."""
    K = [500.0, 0, 320.0, 0, 505.0, 240.0, 0, 0, 1]
    cam = CameraIntrinsics.from_camera_info(K, D=[-0.2, 0.05, 0.001])
    assert float(cam.fx) == 500.0 and float(cam.fy) == 505.0
    assert float(cam.cx) == 320.0 and float(cam.cy) == 240.0
    np.testing.assert_allclose(np.asarray(cam.dist), [-0.2, 0.05, 0.001, 0, 0])
    cam2 = CameraIntrinsics.from_camera_info(K, D=list(range(1, 9)))
    np.testing.assert_allclose(np.asarray(cam2.dist), [1, 2, 3, 4, 5])
    cam3 = CameraIntrinsics.from_camera_info(K)
    np.testing.assert_allclose(np.asarray(cam3.dist), 0.0)


def test_pnp_shallow_angle_ambiguity(rng):
    """Dual-start refinement must resolve the planar two-fold ambiguity at
    shallow view angles at least as reliably as OpenCV IPPE_SQUARE
    (measured: both flip on ~1% of genuinely noise-ambiguous cases)."""
    cv2 = pytest.importorskip("cv2")
    obj = np.asarray(pnp.marker_object_points(MARKER_LEN), np.float64)
    flips = 0
    n = 0
    for _ in range(60):
        ang = np.deg2rad(rng.uniform(60, 85))
        axis = rng.normal(size=3)
        axis[2] = 0
        axis /= np.linalg.norm(axis)
        Rb = cv2.Rodrigues(np.array([np.pi, 0, 0]))[0]
        Rt = cv2.Rodrigues(axis * ang)[0] @ Rb
        rvec = cv2.Rodrigues(Rt)[0].ravel()
        tvec = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2),
                         rng.uniform(0.8, 2.0)])
        corners = np.asarray(project_marker(rvec, tvec, CAM_NODIST))
        if not np.all(np.isfinite(corners)):
            continue
        noisy = corners + rng.normal(scale=0.3, size=corners.shape)
        res = pnp.solve_pnp_square(jnp.asarray(noisy, jnp.float32), CAM_NODIST, MARKER_LEN)
        R_est = np.asarray(geometry.rodrigues(res.rvec))
        err = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ Rt) - 1) / 2, -1, 1)))
        n += 1
        if err > 30:
            flips += 1
    assert n >= 50
    assert flips <= 3, (flips, n)
