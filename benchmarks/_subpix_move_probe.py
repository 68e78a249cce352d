"""How far does subpix refinement actually move a corner? Sizes the
total-move clamp for the patch-once subpix rewrite. Runs the detector on
the parity-sweep scenes (clean + degraded) and reports the distribution
of |refined - initial| over all valid candidate corners."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import detector_parity_sweep as sw
from aruco_slam_tpu.ops import detector


def main():
    cfg = detector.DetectorConfig()
    moves = []

    def corners_pre_post(img):
        fg, labels = detector._threshold_and_label(
            jnp.asarray(img), cfg.adaptive_radius, cfg
        )
        quads, valid = detector.extract_quads(labels, fg, cfg)
        extent = jnp.max(
            jnp.max(quads, axis=1) - jnp.min(quads, axis=1), axis=-1
        )
        refined = detector.refine_corners_subpix(
            jnp.asarray(img).astype(jnp.float32), quads,
            window=cfg.subpix_window, iters=cfg.subpix_iters,
            window_small=cfg.subpix_window_small,
            small=extent < cfg.subpix_small_extent,
        )
        d = np.asarray(jnp.abs(refined - quads)).max(axis=-1)  # [K, 4]
        v = np.asarray(valid)
        return d[v].reshape(-1)

    for cond_name, fn in [("clean", lambda x: x)] + sw.conditions():
        for name, img, _ in sw.scenes():
            moves.append(corners_pre_post(fn(img)))
    m = np.concatenate(moves)
    qs = [50, 90, 99, 99.9, 100]
    print(f"n={m.size}")
    for q in qs:
        print(f"p{q}: {np.percentile(m, q):.3f} px")
    for thr in (1.0, 1.5, 2.0, 3.0):
        print(f"frac > {thr}: {(m > thr).mean():.5f}")


if __name__ == "__main__":
    main()
