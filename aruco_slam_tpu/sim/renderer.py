"""Synthetic marker-image renderer (L3) — the image-level data source that
replaces the reference's Gazebo camera (launch/slam.launch:22-36).

Per-pixel inverse ray casting, fully vectorized in JAX: each pixel's ray is
intersected with every marker's plane; the nearest hit samples the marker's
printed pattern (5x5 bits + 1-cell black border; outer side = marker_length,
the same convention as the reference corners/PnP — aruco_slam.h:189).
Includes lens distortion (forward model applied to ray directions) so the
rendered geometry matches the camera model used by PnP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.ops.camera import CameraIntrinsics, pixels_to_normalized
from aruco_slam_tpu.ops.dictionary import marker_pattern

Array = jax.Array

BACKGROUND = 178
WHITE = 255
BLACK = 25


def build_marker_stack(marker_map) -> dict:
    """Host-side precompute: per-marker pattern bits, world rotation and
    position arrays for the renderer."""
    from aruco_slam_tpu.sim.synthetic import rpy_matrix_np

    n = len(marker_map)
    patterns = np.stack(
        [marker_pattern(int(marker_map.ids[i])) for i in range(n)]
    )  # [L, 7, 7]
    R_wm = np.stack([rpy_matrix_np(*marker_map.rpys[i]) for i in range(n)])
    return {
        "patterns": jnp.asarray(patterns),
        "R_wm": jnp.asarray(R_wm, jnp.float32),
        "pos": jnp.asarray(marker_map.positions, jnp.float32),
        "lengths": jnp.asarray(marker_map.lengths, jnp.float32),
    }


def render_frame(
    cam_pos: Array,  # [3] camera position in world
    R_wc: Array,  # [3, 3] camera axes in world (cols: x right, y down, z fwd)
    stack: dict,
    camera: CameraIntrinsics,
    height: int = 480,
    width: int = 640,
) -> Array:
    """Render one grayscale uint8 frame [H, W]."""
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # [H, W]
    px = jnp.stack([uu, vv], axis=-1).reshape(-1, 2)  # [P, 2]
    norm = pixels_to_normalized(px, camera)  # undistorted ray slopes
    dirs = jnp.concatenate([norm, jnp.ones_like(norm[:, :1])], axis=-1)  # [P,3]

    def per_marker(R_wm, pos, length, pattern):
        # Express the plane in camera coords
        R_cm = R_wc.T @ R_wm  # marker axes in camera frame
        c0 = R_wc.T @ (pos - cam_pos)  # marker center in camera frame
        n = R_cm[:, 2]  # plane normal
        denom = dirs @ n  # [P]
        t = (c0 @ n) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        X = dirs * t[:, None]  # intersection points [P, 3]
        rel = X - c0
        mu = rel @ R_cm[:, 0]  # marker-plane u (right)
        mv = rel @ R_cm[:, 1]  # marker-plane v (up)
        half = length / 2.0
        inside = (jnp.abs(mu) <= half) & (jnp.abs(mv) <= half) & (t > 0.05)
        cell = length / 7.0
        col = jnp.clip(((mu + half) / cell).astype(jnp.int32), 0, 6)
        row = jnp.clip(((half - mv) / cell).astype(jnp.int32), 0, 6)
        bit = pattern[row, col]
        color = jnp.where(bit > 0, WHITE, BLACK).astype(jnp.float32)
        return inside, t, color

    inside, t, color = jax.vmap(per_marker)(
        stack["R_wm"], stack["pos"], stack["lengths"], stack["patterns"]
    )  # each [L, P]

    t_masked = jnp.where(inside, t, jnp.inf)
    nearest = jnp.argmin(t_masked, axis=0)  # [P]
    any_hit = jnp.any(inside, axis=0)
    chosen = jnp.take_along_axis(color, nearest[None, :], axis=0)[0]
    img = jnp.where(any_hit, chosen, float(BACKGROUND))
    return img.reshape(height, width).astype(jnp.uint8)


def camera_pose_from_robot(pose, t_r2c=(0.0, 0.0), cam_height: float = 0.3):
    """Robot planar pose -> (cam_pos [3], R_wc [3,3]) with the optical
    convention z=heading, x=right, y=down (see ops.pnp docstring)."""
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    cam_pos = jnp.stack(
        [x + c * t_r2c[0] - s * t_r2c[1], y + s * t_r2c[0] + c * t_r2c[1],
         jnp.full_like(x, cam_height)],
        axis=-1,
    )
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    # columns: x_cam=(s,-c,0), y_cam=(0,0,-1), z_cam=(c,s,0)
    R_wc = jnp.stack(
        [
            jnp.stack([s, zero, c], axis=-1),
            jnp.stack([-c, zero, s], axis=-1),
            jnp.stack([zero, -one, zero], axis=-1),
        ],
        axis=-2,
    )
    return cam_pos, R_wc


def render_sequence_frames(seq, marker_map, camera, t_r2c=(0.0, 0.0),
                           height: int = 480, width: int = 640) -> np.ndarray:
    """Render all frames of a sequence (host loop, jitted per-frame)."""
    stack = build_marker_stack(marker_map)
    poses = seq.meta.get("true_pose_frames_world", seq.true_pose_frames)
    render = jax.jit(
        lambda p: render_frame(
            *camera_pose_from_robot(jnp.asarray(p, jnp.float32), t_r2c),
            stack, camera, height, width,
        )
    )
    return np.stack([np.asarray(render(p)) for p in poses])
