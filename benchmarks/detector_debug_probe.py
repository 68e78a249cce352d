"""Diagnose why far/small and shallow markers that cv2 finds are missed:
dump every candidate's pipeline verdict for the failing scenes."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aruco_slam_tpu.ops import detector
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import renderer, synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)


def scene(name):
    arena = synthetic.make_arena(n_markers=20)
    big = synthetic.make_arena(n_markers=28, width=14.0, height=11.0)
    poses = {
        "far_small": (big, (2.0, -2.0, 0.4)),
        "far_small2": (big, (11.0, -9.0, 2.8)),
        "shallow2": (arena, (4.6, -2.2, -np.pi / 2 * 0.92)),
    }
    mp, pose = poses[name]
    stack = renderer.build_marker_stack(mp)
    cam_pos, R_wc = renderer.camera_pose_from_robot(jnp.asarray(pose, jnp.float32))
    img = np.asarray(renderer.render_frame(cam_pos, R_wc, stack, CAM))
    return img, mp


def dump(name):
    import cv2

    img, mp = scene(name)
    cfg = detector.DetectorConfig()
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
    cv_det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
    cv_corners, cv_ids, _ = cv_det.detectMarkers(img)
    cv_found = {} if cv_ids is None else {
        int(i): c.reshape(4, 2) for i, c in zip(cv_ids.reshape(-1), cv_corners)
    }
    print(f"\n=== {name}: cv2 ids {sorted(cv_found)}")

    im = jnp.asarray(img)
    quads, cand_valid = detector._candidates_at_radius(
        im, cfg.adaptive_radius, cfg
    )
    refined = detector.refine_corners_subpix(
        im, quads, cfg.subpix_window, cfg.subpix_iters
    )
    mids, corners, contrast, border_errs, dict_ok = detector.decode_candidates(
        im, refined, cfg
    )
    det_full = detector.detect_markers(im, cfg)
    ours = set(int(i) for i in np.asarray(det_full.ids)[np.asarray(det_full.valid)])
    print(f"    ours: {sorted(ours)}  missing vs cv2: {sorted(set(cv_found) - ours)}")
    for k in range(cfg.max_candidates):
        if not bool(cand_valid[k]) and float(contrast[k]) < 1:
            continue
        c = np.asarray(quads[k])
        print(
            f"  cand{k:2d} valid={bool(cand_valid[k])} id={int(mids[k]):4d} "
            f"ok={bool(dict_ok[k])} border={float(border_errs[k]):4.1f} "
            f"contrast={float(contrast[k]):6.1f} "
            f"quad_center=({c[:,0].mean():6.1f},{c[:,1].mean():6.1f}) "
            f"extent={max(np.ptp(c[:,0]), np.ptp(c[:,1])):6.1f}"
        )
    # where should the missing markers be?
    for mid, cc in cv_found.items():
        if mid not in ours:
            print(
                f"  MISSED id {mid}: cv2 center "
                f"({cc[:,0].mean():6.1f},{cc[:,1].mean():6.1f}) "
                f"extent {max(np.ptp(cc[:,0]), np.ptp(cc[:,1])):5.1f}px"
            )


if __name__ == "__main__":
    for n in ("far_small", "far_small2", "shallow2"):
        dump(n)
