"""Detector adverse-conditions parity sweep vs cv2.aruco (VERDICT round 1
item 6): heavy blur, sensor noise, low contrast, low light, illumination
ramps, far/small markers, shallow view angles.

For each scene the union of clean-image detections (ours | cv2), filtered
to ids actually present in the arena, is the per-scene detectable set; each
condition then measures recall of that set for both detectors on identical
degraded frames, plus direct asymmetries (markers cv2 finds that we miss,
and vice versa) and false detections (ids not in the arena).

Prints a markdown table (pasted into docs/PARITY.md) and writes
benchmarks/detector_parity.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # CPU sweep: many small images

import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from aruco_slam_tpu.ops import detector
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import renderer, synthetic

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
RNG = np.random.default_rng(42)


def scenes():
    """(name, image, arena_ids) for a spread of poses: mid-range, close,
    far/small, shallow-angle."""
    out = []
    arena = synthetic.make_arena(n_markers=20)
    stack = renderer.build_marker_stack(arena)
    big = synthetic.make_arena(n_markers=28, width=14.0, height=11.0)
    big_stack = renderer.build_marker_stack(big)
    poses = [
        ("mid", stack, arena, (2.55, -2.0, 1.2)),
        ("mid2", stack, arena, (1.2, -3.4, -2.2)),
        ("close", stack, arena, (0.9, -0.9, 2.4)),
        # far wall ~9-13 m away -> 12-18 px markers
        ("far_small", big_stack, big, (2.0, -2.0, 0.4)),
        ("far_small2", big_stack, big, (11.0, -9.0, 2.8)),
        # hugging a wall -> markers seen at very shallow angles
        ("shallow", stack, arena, (0.45, -2.4, np.pi / 2 * 0.94)),
        ("shallow2", stack, arena, (4.6, -2.2, -np.pi / 2 * 0.92)),
    ]
    for name, st, mp, pose in poses:
        cam_pos, R_wc = renderer.camera_pose_from_robot(
            jnp.asarray(pose, jnp.float32)
        )
        img = np.asarray(renderer.render_frame(cam_pos, R_wc, st, CAM))
        out.append((name, img, set(int(i) for i in mp.ids)))
    return out


def conditions():
    def noise(img, s):
        return np.clip(
            img.astype(np.float32) + RNG.normal(scale=s, size=img.shape), 0, 255
        ).astype(np.uint8)

    def blur(img, s):
        return np.clip(gaussian_filter(img.astype(np.float32), s), 0, 255).astype(
            np.uint8
        )

    def contrast(img, lo, hi):
        f = img.astype(np.float32) / 255.0
        return np.clip(lo + f * (hi - lo), 0, 255).astype(np.uint8)

    def ramp(img, lo, hi):
        h, w = img.shape
        gain = lo + (hi - lo) * np.linspace(0, 1, w)[None, :]
        return np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)

    return [
        ("clean", lambda im: im),
        ("noise_s8", lambda im: noise(im, 8)),
        ("noise_s25", lambda im: noise(im, 25)),
        ("blur_s1", lambda im: blur(im, 1.0)),
        ("blur_s2", lambda im: blur(im, 2.0)),
        ("blur_s3", lambda im: blur(im, 3.0)),
        ("low_contrast", lambda im: contrast(im, 105, 150)),
        ("low_light", lambda im: noise(contrast(im, 0, 64), 4)),
        ("illum_ramp_3x", lambda im: ramp(im, 0.45, 1.35)),
        ("blur+noise", lambda im: noise(blur(im, 1.5), 10)),
    ]


def ours_ids(img, cfg):
    det = detector.detect_markers(jnp.asarray(img), cfg)
    return set(int(i) for i in np.asarray(det.ids)[np.asarray(det.valid)])


def cv2_ids(img, cv_det):
    _, ids, _ = cv_det.detectMarkers(img)
    if ids is None:
        return set()
    return set(int(i) for i in ids.reshape(-1))


def main():
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
    params = cv2.aruco.DetectorParameters()
    cv_det = cv2.aruco.ArucoDetector(d, params)
    cfg = detector.DetectorConfig()

    sc = scenes()
    base = {}
    for name, img, arena_ids in sc:
        o = ours_ids(img, cfg) & arena_ids
        c = cv2_ids(img, cv_det) & arena_ids
        base[name] = o | c
        print(f"scene {name}: detectable={sorted(base[name])} "
              f"(ours {len(o)}, cv2 {len(c)})", flush=True)

    rows = []
    for cond_name, fn in conditions():
        tot = our_hits = cv_hits = cv_only = we_only = 0
        our_false = cv_false = 0
        for name, img, arena_ids in sc:
            det_set = base[name]
            if not det_set:
                continue
            deg = fn(img)
            o = ours_ids(deg, cfg)
            c = cv2_ids(deg, cv_det)
            o_t, c_t = o & arena_ids, c & arena_ids
            tot += len(det_set)
            our_hits += len(o_t & det_set)
            cv_hits += len(c_t & det_set)
            cv_only += len((c_t - o_t) & det_set)
            we_only += len((o_t - c_t) & det_set)
            our_false += len(o - arena_ids)
            cv_false += len(c - arena_ids)
        rows.append(
            dict(
                condition=cond_name, detectable=tot,
                ours_recall=round(our_hits / tot, 3),
                cv2_recall=round(cv_hits / tot, 3),
                cv2_only=cv_only, ours_only=we_only,
                ours_false=our_false, cv2_false=cv_false,
            )
        )
        print(rows[-1], flush=True)

    print("\n| condition | detectable | ours recall | cv2 recall | "
          "cv2-only | ours-only | ours false | cv2 false |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['condition']} | {r['detectable']} | {r['ours_recall']:.3f} "
            f"| {r['cv2_recall']:.3f} | {r['cv2_only']} | {r['ours_only']} "
            f"| {r['ours_false']} | {r['cv2_false']} |"
        )
    with open(os.path.join(os.path.dirname(__file__), "detector_parity.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
