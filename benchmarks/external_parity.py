"""External-imagery detector parity (VERDICT round 2 item 5).

The main parity sweep renders scenes with the repo's own ray-cast renderer
and defines "detectable" as the union of either detector's clean-image
detections — fine as a regression harness, weak as a parity claim (ours is
tuned on that renderer, cv2 isn't; VERDICT round 2 "weak" item 5).

This leg removes both biases:

- **Images come from OpenCV's own pipeline**, not ours: patterns from
  ``cv2.aruco.generateImageMarker``, placed by ``cv2.warpPerspective``
  (bilinear PSF) on a 3x supersampled canvas, downsampled with
  ``cv2.resize INTER_AREA`` (box PSF) — a rendering stack, point-spread
  function and edge model this repo's detector has never seen.
- **Ground truth is the actual placed markers** (filtered to those fully
  in frame with projected min side >= 12 px), not a detector union.

Also reports mean corner error (px) against the projected ground-truth
corners for markers both detectors find — accuracy, not just recall.

Writes an ``external`` section into benchmarks/detector_parity.json and
prints the PARITY.md rows.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aruco_slam_tpu.ops import detector

W, H = 640, 480
SS = 3  # supersample factor
K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
RNG = np.random.default_rng(7)


def rot(yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return Ry @ Rx


def scene_defs():
    """Marker placements (id, center xyz in camera frame, yaw, pitch, side m)
    per scene — a spread of ranges (1.2-9 m) and view angles (0-65 deg)."""
    return [
        ("ext_mid", [
            (3, (-0.9, -0.3, 2.6), 0.25, 0.1, 0.27),
            (17, (0.7, 0.2, 3.2), -0.4, 0.0, 0.27),
            (42, (0.0, -0.6, 2.0), 0.0, 0.3, 0.27),
            (101, (1.3, 0.5, 4.0), 0.6, -0.2, 0.27),
        ]),
        ("ext_far", [
            (7, (-1.5, -0.5, 7.0), 0.2, 0.0, 0.27),
            (23, (0.5, 0.3, 8.5), -0.3, 0.1, 0.27),
            (55, (2.0, -0.8, 6.0), 0.0, 0.0, 0.27),
            (200, (-0.3, 0.8, 9.0), 0.4, 0.2, 0.27),
        ]),
        ("ext_shallow", [
            (9, (-0.8, -0.2, 2.2), 1.05, 0.0, 0.27),
            (31, (0.6, 0.3, 2.8), -1.1, 0.1, 0.27),
            (77, (0.1, -0.5, 3.5), 0.95, -0.15, 0.27),
            (150, (1.5, 0.4, 3.0), -0.9, 0.3, 0.27),
        ]),
        ("ext_close", [
            (12, (-0.35, -0.15, 1.2), 0.15, 0.1, 0.27),
            (88, (0.45, 0.2, 1.6), -0.35, -0.1, 0.27),
        ]),
    ]


def render_scene(cv2, markers, photometrics=True):
    """OpenCV-rendered scene; returns (img uint8 [H, W], gt dict id ->
    corners [4, 2] px in OUR corner order: pattern TL, TR, BR, BL)."""
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
    canvas = np.full((H * SS, W * SS), 165, np.float32)
    Kss = K.copy() * SS
    Kss[2, 2] = 1.0
    gt = {}
    # far markers first so near ones overdraw on overlap
    for mid, c, yaw, pitch, side in sorted(
        markers, key=lambda m: -m[1][2]
    ):
        cell_px = 24
        pat = cv2.aruco.generateImageMarker(d, mid, 7 * cell_px)
        R = rot(yaw, pitch)
        h = side / 2
        # marker corners in marker frame (TL, TR, BR, BL as the pattern)
        obj = np.array(
            [[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]], np.float64
        )
        pts = (R @ obj.T).T + np.asarray(c)
        if np.any(pts[:, 2] <= 0.1):
            continue
        proj_ss = (Kss @ (pts / pts[:, 2:3]).T).T[:, :2].astype(np.float32)
        src = np.array(
            [[0, 0], [7 * cell_px, 0], [7 * cell_px, 7 * cell_px],
             [0, 7 * cell_px]], np.float32
        )
        Hm = cv2.getPerspectiveTransform(src, proj_ss)
        warped = cv2.warpPerspective(
            pat, Hm, (W * SS, H * SS), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=255,
        )
        mask = cv2.warpPerspective(
            np.full_like(pat, 255), Hm, (W * SS, H * SS),
            flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        )
        m = mask > 127
        # markers print on white paper: remap 0..255 -> 30..235
        canvas[m] = 30.0 + warped[m].astype(np.float32) * (205.0 / 255.0)
        proj = proj_ss / SS
        side_px = min(
            np.linalg.norm(proj[i] - proj[(i + 1) % 4]) for i in range(4)
        )
        fully_in = np.all(
            (proj >= 2) & (proj < [[W - 2, H - 2]])
        )
        if fully_in and side_px >= 12:
            gt[mid] = proj
    img = cv2.resize(canvas, (W, H), interpolation=cv2.INTER_AREA)
    if photometrics:
        yy, xx = np.mgrid[0:H, 0:W]
        r2 = ((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2
        img = img * (1.0 - 0.18 * r2)  # vignette
        img = 255.0 * (img / 255.0) ** 1.08  # gamma
        img = img + RNG.normal(scale=np.sqrt(np.maximum(img, 1.0)) * 0.35)
    return np.clip(img, 0, 255).astype(np.uint8), gt


def ours_detect(img, cfg):
    det = detector.detect_markers(jnp.asarray(img), cfg)
    ids = np.asarray(det.ids)
    corners = np.asarray(det.corners)
    valid = np.asarray(det.valid)
    return {int(i): corners[k] for k, i in enumerate(ids) if valid[k]}


def cv2_detect(cv2, cv_det, img):
    corners, ids, _ = cv_det.detectMarkers(img)
    if ids is None:
        return {}
    return {int(i): c.reshape(4, 2) for i, c in zip(ids.reshape(-1), corners)}


def corner_err(found, gt):
    errs = [
        float(np.linalg.norm(found[i] - gt[i], axis=1).mean())
        for i in found if i in gt
    ]
    return float(np.mean(errs)) if errs else None


def main():
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
    cv_det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
    cfg = detector.DetectorConfig()

    rows = []
    tot = ours_hits = cv_hits = ours_false = cv_false = 0
    ours_errs, cv_errs = [], []
    for name, markers in scene_defs():
        img, gt = render_scene(cv2, markers)
        o = ours_detect(img, cfg)
        c = cv2_detect(cv2, cv_det, img)
        gset = set(gt)
        tot += len(gset)
        ours_hits += len(set(o) & gset)
        cv_hits += len(set(c) & gset)
        ours_false += len(set(o) - gset)
        cv_false += len(set(c) - gset)
        eo, ec = corner_err(o, gt), corner_err(c, gt)
        if eo is not None:
            ours_errs.append(eo)
        if ec is not None:
            cv_errs.append(ec)
        rows.append(
            dict(scene=name, ground_truth=len(gset),
                 ours=sorted(set(o) & gset), cv2=sorted(set(c) & gset),
                 ours_false=sorted(set(o) - gset),
                 cv2_false=sorted(set(c) - gset),
                 ours_corner_err_px=eo and round(eo, 3),
                 cv2_corner_err_px=ec and round(ec, 3))
        )
        print(rows[-1], flush=True)

    summary = dict(
        condition="external (cv2-rendered)",
        ground_truth_total=tot,
        ours_recall=round(ours_hits / tot, 3),
        cv2_recall=round(cv_hits / tot, 3),
        ours_false=ours_false, cv2_false=cv_false,
        ours_corner_err_px=round(float(np.mean(ours_errs)), 3),
        cv2_corner_err_px=round(float(np.mean(cv_errs)), 3),
    )
    print(json.dumps(summary, indent=1))
    path = os.path.join(os.path.dirname(__file__), "detector_parity.json")
    data = json.load(open(path))
    if isinstance(data, list):
        data = {"rendered_conditions": data}
    data["external"] = {"summary": summary, "scenes": rows}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
