"""Robustness: detection under sensor noise / blur / illumination gradients,
and the divergence-gate compat flag behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops import detector
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import renderer, synthetic
from aruco_slam_tpu.utils.config import CompatConfig, EkfConfig, SlamConfig

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)


def _scene(pose=(2.55, -2.0, 1.2)):
    arena = synthetic.make_arena(n_markers=20)
    stack = renderer.build_marker_stack(arena)
    cam_pos, R_wc = renderer.camera_pose_from_robot(jnp.asarray(pose, jnp.float32))
    img = np.asarray(renderer.render_frame(cam_pos, R_wc, stack, CAM))
    det0 = detector.detect_markers(jnp.asarray(img))
    base_ids = {int(i) for i in np.asarray(det0.ids)[np.asarray(det0.valid)]}
    assert len(base_ids) >= 2
    return img, base_ids


def _found(img):
    det = detector.detect_markers(jnp.asarray(img))
    return {int(i) for i in np.asarray(det.ids)[np.asarray(det.valid)]}


def test_detection_under_sensor_noise(rng):
    img, base = _scene()
    noisy = np.clip(
        img.astype(np.float32) + rng.normal(scale=8.0, size=img.shape), 0, 255
    ).astype(np.uint8)
    assert base.issubset(_found(noisy)), (base, _found(noisy))


def test_detection_under_illumination_gradient():
    img, base = _scene()
    h, w = img.shape
    gain = 0.55 + 0.65 * np.linspace(0, 1, w)[None, :]
    shaded = np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)
    found = _found(shaded)
    # adaptive threshold must survive a ~2x illumination ramp
    assert len(base & found) >= max(1, len(base) - 1), (base, found)


def test_detection_under_mild_blur():
    img, base = _scene()
    # 3x3 box blur
    f = img.astype(np.float32)
    b = np.pad(f, 1, mode="edge")
    blurred = sum(
        b[1 + dy: 1 + dy + f.shape[0], 1 + dx: 1 + dx + f.shape[1]]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ) / 9.0
    found = _found(np.clip(blurred, 0, 255).astype(np.uint8))
    assert len(base & found) >= max(1, len(base) - 1), (base, found)


def test_divergence_gate_flag(rng):
    """quirk (d): log-only by default (update applied, counter bumps);
    CompatConfig.reject_divergent=True actually rejects the update."""
    def run(reject):
        cfg = SlamConfig(
            ekf=EkfConfig(max_landmarks=8, max_observations_per_frame=4),
            compat=CompatConfig(reject_divergent=reject, stationary_gate=False),
        )
        state = ekf.init_state(cfg)._replace(initialized=jnp.ones((), bool))
        upd = jax.jit(ekf.update, static_argnums=2)
        pred = jax.jit(ekf.predict, static_argnums=2)
        state = pred(state, ekf.Control(jnp.float32(1), jnp.float32(1), jnp.float32(0.05)), cfg)
        R = jnp.tile(jnp.eye(3) * 0.01, (4, 1, 1)).astype(jnp.float32)
        ids = jnp.asarray([5, -1, -1, -1], jnp.int32)
        z1 = jnp.zeros((4, 3), jnp.float32).at[0].set(jnp.asarray([1.0, 0.0, 0.0]))
        valid = jnp.asarray([True, False, False, False])
        state = upd(state, ekf.FrameObservations(ids, z1, R, valid), cfg)
        mu_before = np.asarray(state.mu).copy()
        # wildly inconsistent re-observation -> innovation >> 1
        z2 = jnp.zeros((4, 3), jnp.float32).at[0].set(jnp.asarray([5.0, 5.0, 1.0]))
        state = upd(state, ekf.FrameObservations(ids, z2, R, valid), cfg)
        return mu_before, np.asarray(state.mu), int(state.diverged)

    mu_b0, mu_a0, div0 = run(reject=False)
    assert div0 >= 1
    assert np.abs(mu_a0 - mu_b0).max() > 0.1  # applied (reference behavior)
    mu_b1, mu_a1, div1 = run(reject=True)
    assert div1 >= 1
    np.testing.assert_allclose(mu_a1, mu_b1, atol=1e-6)  # rejected
