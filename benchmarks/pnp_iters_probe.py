"""Accuracy vs refine_iters for solve_pnp_square: translation/rotation
error vs ground truth and vs cv2 IPPE_SQUARE, plus shallow-angle flip
rate — picks the minimum sequential depth for the headline pipeline."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aruco_slam_tpu.ops import geometry, pnp
from aruco_slam_tpu.ops.camera import CameraIntrinsics

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
L = 0.27
rng = np.random.default_rng(7)


def make_pose(dist_range=(0.5, 2.5)):
    import cv2

    t = np.array(
        [rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3), rng.uniform(*dist_range)]
    )
    ang = rng.uniform(0.0, 0.9)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    Rb = cv2.Rodrigues(np.array([np.pi, 0.0, 0.0]))[0]
    Rt = cv2.Rodrigues(axis * ang)[0] @ Rb
    return cv2.Rodrigues(Rt)[0].ravel(), t


def project(rvec, tvec, noise=0.0):
    import cv2

    obj = np.asarray(pnp.marker_object_points(L))
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    px, _ = cv2.projectPoints(obj.astype(np.float64), rvec, tvec, K, np.zeros(5))
    px = px.reshape(4, 2)
    if noise:
        px = px + rng.normal(scale=noise, size=px.shape)
    return px


def sweep():
    import cv2

    trials = [(make_pose(), 0.15) for _ in range(200)]
    for iters in (4, 6, 8, 10, 14):
        solve = jax.jit(
            lambda px, it=iters: pnp.solve_pnp_square(px, CAM, L, refine_iters=it)
        )
        terr = []
        rerr = []
        for (rvec, tvec), noise in trials:
            px = project(rvec, tvec, noise)
            res = solve(jnp.asarray(px, jnp.float32))
            terr.append(np.linalg.norm(np.asarray(res.tvec) - tvec))
            R_est = np.asarray(geometry.rodrigues(res.rvec))
            R_true = cv2.Rodrigues(rvec)[0]
            c = (np.trace(R_true.T @ R_est) - 1) / 2
            rerr.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        print(
            f"iters {iters:2d}: t_err mean {np.mean(terr)*1e3:6.2f} mm "
            f"p95 {np.percentile(terr,95)*1e3:6.2f} | r_err mean "
            f"{np.mean(rerr):5.2f} deg p95 {np.percentile(rerr,95):5.2f}",
            flush=True,
        )

    # shallow-angle flip rate (the regression that forced dual-start)
    import cv2

    for iters in (6, 8, 10):
        solve = jax.jit(
            lambda px, it=iters: pnp.solve_pnp_square(px, CAM, L, refine_iters=it)
        )
        flips = 0
        n = 400
        rng2 = np.random.default_rng(3)
        for k in range(n):
            ang = rng2.uniform(0.6, 1.1)
            axis = rng2.normal(size=3)
            axis /= np.linalg.norm(axis)
            Rb = cv2.Rodrigues(np.array([np.pi, 0.0, 0.0]))[0]
            Rt = cv2.Rodrigues(axis * ang)[0] @ Rb
            rvec = cv2.Rodrigues(Rt)[0].ravel()
            tvec = np.array([rng2.uniform(-0.3, 0.3), rng2.uniform(-0.2, 0.2),
                             rng2.uniform(1.0, 2.5)])
            px = project(rvec, tvec) + rng2.normal(scale=0.3, size=(4, 2))
            res = solve(jnp.asarray(px, jnp.float32))
            R_est = np.asarray(geometry.rodrigues(res.rvec))
            R_true = cv2.Rodrigues(rvec)[0]
            c = (np.trace(R_true.T @ R_est) - 1) / 2
            if np.degrees(np.arccos(np.clip(c, -1, 1))) > 25:
                flips += 1
        print(f"iters {iters:2d}: shallow-angle flips {flips}/{n}", flush=True)


if __name__ == "__main__":
    sweep()
