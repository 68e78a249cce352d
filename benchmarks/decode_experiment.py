"""Try decode-sampling variants on the scenes where cv2 finds markers we
miss (far/small + shallow) — picks the DetectorConfig defaults."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aruco_slam_tpu.ops import detector
from detector_debug_probe import scene

SCENES = ["far_small", "far_small2", "shallow2"]
CV2_IDS = {}
IMGS = {}


def setup():
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_ARUCO_ORIGINAL)
    cv_det = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
    for n in SCENES:
        img, mp = scene(n)
        IMGS[n] = img
        _, ids, _ = cv_det.detectMarkers(img)
        arena = set(int(i) for i in mp.ids)
        CV2_IDS[n] = (set() if ids is None else
                      set(int(i) for i in ids.reshape(-1))) & arena


def run(tag, **kw):
    cfg = detector.DetectorConfig(**kw)
    tot_cv = tot_hit = tot_extra = 0
    per = []
    for n in SCENES:
        det = detector.detect_markers(jnp.asarray(IMGS[n]), cfg)
        ours = set(int(i) for i in np.asarray(det.ids)[np.asarray(det.valid)])
        hit = len(ours & CV2_IDS[n])
        tot_cv += len(CV2_IDS[n])
        tot_hit += hit
        tot_extra += len(ours - CV2_IDS[n])
        per.append(f"{n}:{hit}/{len(CV2_IDS[n])}+{len(ours - CV2_IDS[n])}")
    print(f"{tag:42s} cv2-overlap {tot_hit}/{tot_cv} extra {tot_extra}  [{' '.join(per)}]",
          flush=True)


if __name__ == "__main__":
    setup()
    run("baseline")
    run("margin 0.15", cell_margin=0.15)
    run("margin 0.25", cell_margin=0.25)
    run("margin 0.15 + vote", cell_margin=0.15, cell_vote=True)
    run("vote only", cell_vote=True)
    run("margin 0.15, subpix_window 2", cell_margin=0.15, subpix_window=2)
    run("margin 0.25, subpix_window 2", cell_margin=0.25, subpix_window=2)
    run("margin 0.15, samples 5", cell_margin=0.15, cell_samples=5)
    run("margin 0.25, samples 5", cell_margin=0.25, cell_samples=5)
    run("samples 1 (center only)", cell_samples=1)

# adaptive check (run with: python decode_experiment.py adaptive)
def run_adaptive():
    setup()
    run("adaptive default (new)")
    run("adaptive + margin 0.15", cell_margin=0.15)
