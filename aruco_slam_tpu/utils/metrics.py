"""Trajectory / map evaluation (L4): ATE, RPE, landmark map error.

The reference validated visually in rviz against a latched ground-truth map
(src/aruco_slam_node.cpp:62-67); these metrics make that comparison
quantitative, per BASELINE.md ("ATE (m) vs reference map").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aruco_slam_tpu.ops import geometry

Array = jax.Array


def ate(
    est_xy: Array, true_xy: Array, align: bool = False
) -> Array:
    """Absolute trajectory error: RMSE of 2-D position error.

    ``align=True`` first finds the least-squares SE(2) transform mapping the
    estimate onto the truth (2-D Umeyama, rotation+translation, no scale).
    The SLAM world frame is anchored at the start pose, so the unaligned
    number is the headline metric (matching the reference's world-frame
    comparison); aligned ATE isolates drift shape from gauge.
    """
    est = est_xy[..., :2]
    true = true_xy[..., :2]
    if align:
        est = align_se2(est, true)
    err = est - true
    return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1)))


def align_se2(src: Array, dst: Array) -> Array:
    """Least-squares rotation+translation aligning src points to dst."""
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    s = src - mu_s
    d = dst - mu_d
    # 2x2 cross-covariance; optimal rotation angle from its components
    C = s.T @ d
    theta = jnp.arctan2(C[0, 1] - C[1, 0], C[0, 0] + C[1, 1])
    c, si = jnp.cos(theta), jnp.sin(theta)
    R = jnp.array([[c, -si], [si, c]])
    return (src - mu_s) @ R.T + mu_d


def rpe(est_pose: Array, true_pose: Array, delta: int = 10):
    """Relative pose error over a frame gap: (translation RMSE, rot RMSE)."""
    e0, e1 = est_pose[:-delta], est_pose[delta:]
    t0, t1 = true_pose[:-delta], true_pose[delta:]
    de = geometry.se2_relative(e0, e1)
    dt = geometry.se2_relative(t0, t1)
    err = de - dt
    trans = jnp.sqrt(jnp.mean(jnp.sum(err[..., :2] ** 2, axis=-1)))
    rot = jnp.sqrt(jnp.mean(geometry.wrap_angle(err[..., 2]) ** 2))
    return trans, rot


def map_error(
    est_lms: Array,  # [max_lm, 3]
    est_ids: Array,  # [max_lm]
    active: Array,  # [max_lm] bool
    true_lms: Array,  # [L, 3]
    true_ids: Array,  # [L]
):
    """Per-landmark position RMSE matched by marker id (ids are globally
    unique — the trivial data association the reference exploits through
    ``aruco_id_map``, src/aruco_slam.cpp:423-435).

    Returns (rmse, n_matched).
    """
    hit = est_ids[:, None] == true_ids[None, :]  # [max_lm, L]
    matched = jnp.any(hit, axis=1) & active
    true_idx = jnp.argmax(hit, axis=1)
    ref = true_lms[true_idx]  # [max_lm, 3]
    err2 = jnp.sum((est_lms[:, :2] - ref[:, :2]) ** 2, axis=-1)
    n = jnp.sum(matched)
    rmse = jnp.sqrt(jnp.sum(jnp.where(matched, err2, 0.0)) / jnp.maximum(n, 1))
    return rmse, n
