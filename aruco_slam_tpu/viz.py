"""Output / visualization builders (L4) — the reference's rviz surface
without ROS.

Equivalents of the reference's five output topics (SURVEY.md section 5.5):

- :func:`pose_with_covariance`      — ``toRosPose`` (src/aruco_slam.cpp:378-410)
  including the exact 3-DoF -> 6x6 covariance packing at indices
  {0,1,5,6,7,11,30,31,35} (:399-407)
- :func:`mapped_markers`            — ``toRosMappedMarkers`` (:265-281):
  estimated map as CUBE-marker records (pink, z=0.3, RPY(0, 1.5708, theta))
- :func:`detected_marker_records`   — ``toRosDetectedMarkers`` (:336-347):
  per-frame live detections (red, 0.1 s lifetime)
- :func:`draw_detections`           — ``getMarkedImg`` /
  ``cv::aruco::drawDetectedMarkers`` (:318-319): annotated image
- offline plots (:func:`plot_run`)  — replaces the rviz session entirely
"""

from __future__ import annotations

import numpy as np


def pose_with_covariance(state) -> dict:
    """Pose + covariance record with the reference's 6x6 packing
    (rows/cols x, y, z, rot_x, rot_y, rot_z; planar entries only)."""
    mu = np.asarray(state.mu)
    sigma = np.asarray(state.sigma)
    cov6 = np.zeros(36)
    cov6[0] = sigma[0, 0]
    cov6[1] = sigma[0, 1]
    cov6[5] = sigma[0, 2]
    cov6[6] = sigma[1, 0]
    cov6[7] = sigma[1, 1]
    cov6[11] = sigma[1, 2]
    cov6[30] = sigma[2, 0]
    cov6[31] = sigma[2, 1]
    cov6[35] = sigma[2, 2]
    return {
        "frame_id": "world",
        "position": (float(mu[0]), float(mu[1]), 0.1),  # z=0.1 as reference
        "yaw": float(mu[2]),
        "covariance6x6": cov6,
    }


def mapped_markers(state, config) -> list[dict]:
    """Estimated landmark map as CUBE marker records (reference colors:
    r=1, g=0.5, b=1, a=0.5; pose z=0.3; orientation RPY(0, 1.5708, theta))."""
    from aruco_slam_tpu.models import ekf as ekf_mod

    lms, ids, active = ekf_mod.get_map(state, config)
    lms = np.asarray(lms)
    ids = np.asarray(ids)
    active = np.asarray(active)
    out = []
    for k in range(len(ids)):
        if not active[k]:
            continue
        out.append(
            {
                "id": int(k),
                "aruco_id": int(ids[k]),
                "frame_id": "world",
                "type": "CUBE",
                "scale": (config.aruco.marker_length, config.aruco.marker_length, 0.01),
                "color_rgba": (1.0, 0.5, 1.0, 0.5),
                "position": (float(lms[k, 0]), float(lms[k, 1]), 0.3),
                "rpy": (0.0, 1.5708, float(lms[k, 2])),
                "lifetime": 0.0,
            }
        )
    return out


def detected_marker_records(detections, marker_length: float) -> list[dict]:
    """Live detections (red, 0.1 s lifetime) — reference :336-347."""
    ids = np.asarray(detections.ids)
    valid = np.asarray(detections.valid)
    out = []
    for k in range(len(ids)):
        if not valid[k]:
            continue
        out.append(
            {
                "id": int(ids[k]),
                "frame_id": "base_link",
                "type": "CUBE",
                "scale": (marker_length, marker_length, 0.01),
                "color_rgba": (1.0, 0.0, 0.0, 1.0),
                "corners_px": np.asarray(detections.corners[k]).tolist(),
                "lifetime": 0.1,
            }
        )
    return out


def _draw_line(img, p0, p1, value):
    """Bresenham-ish line on a uint8 image (host-side, no cv2 dependency)."""
    x0, y0 = int(round(p0[0])), int(round(p0[1]))
    x1, y1 = int(round(p1[0])), int(round(p1[1]))
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.linspace(x0, x1, n + 1).round().astype(int)
    ys = np.linspace(y0, y1, n + 1).round().astype(int)
    h, w = img.shape[:2]
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = value
    return img


# 3x5 dot-matrix digit glyphs for the id labels (row-major, top to bottom)
_DIGIT_3X5 = {
    "0": "111101101101111", "1": "010110010010111", "2": "111001111100111",
    "3": "111001111001111", "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001001001001", "8": "111101111101111",
    "9": "111101111001111",
}


def _stamp_text(img, text: str, origin, value, scale: int = 2) -> None:
    """Stamp digits as 3x5 dot-matrix glyphs at ``origin`` (x, y)."""
    h, w = img.shape[:2]
    x0, y0 = int(round(origin[0])), int(round(origin[1]))
    for ch in text:
        glyph = _DIGIT_3X5.get(ch)
        if glyph is None:
            x0 += 4 * scale
            continue
        for r in range(5):
            for c in range(3):
                if glyph[r * 3 + c] == "1":
                    ys = y0 + r * scale
                    xs = x0 + c * scale
                    img[
                        max(0, ys): max(0, min(h, ys + scale)),
                        max(0, xs): max(0, min(w, xs + scale)),
                    ] = value
        x0 += 4 * scale


def draw_detections(img, detections, value: int = 255) -> np.ndarray:
    """Annotated frame (the ``getMarkedImg`` equivalent): marker outlines
    with a double-struck edge at the top-left corner marking orientation,
    and the marker id stamped next to each outline —
    ``cv::aruco::drawDetectedMarkers`` writes the id there too
    (reference src/aruco_slam.cpp:319)."""
    out = np.array(img, copy=True)
    ids = np.asarray(detections.ids)
    valid = np.asarray(detections.valid)
    corners = np.asarray(detections.corners)
    for k in range(len(ids)):
        if not valid[k]:
            continue
        quad = corners[k]
        for a in range(4):
            _draw_line(out, quad[a], quad[(a + 1) % 4], value)
        # emphasize corner 0 (pattern top-left) with a small cross
        c0 = quad[0]
        _draw_line(out, c0 + (-3, -3), c0 + (3, 3), value)
        _draw_line(out, c0 + (-3, 3), c0 + (3, -3), value)
        # id label just right of the quad, vertically centered
        x = quad[:, 0].max() + 3
        y = quad[:, 1].mean() - 5
        _stamp_text(out, str(int(ids[k])), (x, y), value)
    return out


def plot_run(result, seq, path: str) -> bool:
    """Offline trajectory/map plot (replaces the rviz session). Returns
    False when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    traj = np.asarray(result.trajectory)
    fig, ax = plt.subplots(figsize=(7, 6))
    if seq.true_pose_frames is not None:
        ax.plot(seq.true_pose_frames[:, 0], seq.true_pose_frames[:, 1],
                "k--", lw=1, label="ground truth")
    ax.plot(traj[:, 0], traj[:, 1], "b-", lw=1, label="EKF estimate")
    if seq.true_landmarks is not None:
        ax.scatter(seq.true_landmarks[:, 0], seq.true_landmarks[:, 1],
                   marker="s", c="k", s=24, label="true markers")
    mu = np.asarray(result.final_state.mu)
    n = int(result.final_state.n_landmarks)
    lms = mu[3:3 + 3 * n].reshape(-1, 3)
    if len(lms):
        ax.scatter(lms[:, 0], lms[:, 1], marker="x", c="m", s=30,
                   label="estimated markers")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True
