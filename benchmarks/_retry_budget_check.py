"""Quick check: budgeted second-chance decode still recovers the
blur+noise row (0.44 = cv2 parity) and leaves the other conditions at
their round-4 values. Subset of detector_parity_sweep (full sweep takes
~25 min; this runs the 4 retry-sensitive conditions)."""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import detector_parity_sweep as sw
from aruco_slam_tpu.ops import detector

sc = sw.scenes()
sw.RNG = np.random.default_rng(42)
frames = {}
want = {"clean", "noise_s25", "blur_s2", "blur+noise", "illum_ramp_3x"}
# generate EVERY condition's frames in sweep order — the conditions share
# one RNG stream, so skipping any changes the noise realizations of the
# rest and fabricates recall deltas (cost an hour in round 5)
for cond_name, fn in sw.conditions():
    for name, img, ids in sc:
        f = fn(img)
        if cond_name in want:
            frames[(cond_name, name)] = f

cfg = detector.DetectorConfig()
# round-4 reference values (hits out of 25): from docs/PARITY.md + the
# round-5 full sweep with unbudgeted retry
expect = {"clean": 25, "noise_s25": 20, "blur_s2": 12, "blur+noise": 11,
          "illum_ramp_3x": 25}
ok = True
for cond_name in want:
    hits = fo = 0
    for name, img, ids in sc:
        o = sw.ours_ids(frames[(cond_name, name)], cfg)
        hits += len(o & ids)
        fo += len(o - ids)
    status = "OK" if (hits >= expect[cond_name] and fo == 0) else "REGRESS"
    if status != "OK":
        ok = False
    print(f"{cond_name}: hits={hits}/25 (expect>={expect[cond_name]}) "
          f"false={fo} {status}", flush=True)
print("PASS" if ok else "FAIL")
