"""End-to-end demo: simulate a marker arena, run EKF-SLAM, refine with BA,
export the learned map and a trajectory plot.

    python examples/demo.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aruco_slam_tpu import pipeline, runner, viz
from aruco_slam_tpu.io import checkpoint
from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig


def main(out_dir="/tmp/aruco_slam_demo"):
    os.makedirs(out_dir, exist_ok=True)
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=16))

    print("simulating 30 s in a 20-marker arena ...")
    seq = synthetic.generate_sequence(synthetic.SimParams(duration=30.0, seed=1))

    print("running EKF-SLAM + BA (filter -> smoother) ...")
    out = pipeline.ekf_then_ba(seq, cfg)
    metrics = runner.evaluate_sequence(seq, cfg, result=out["ekf_result"])
    print("  ", metrics)
    print("   BA cost:", float(out["stats"].initial_cost), "->",
          float(out["stats"].final_cost))

    result = out["ekf_result"]
    lms, ids, active = ekf.get_map(result.final_state, cfg)
    map_path = os.path.join(out_dir, "learned_map.txt")
    checkpoint.export_learned_map(map_path, lms, ids, active,
                                  marker_length=cfg.aruco.marker_length)
    print("learned map ->", map_path)

    plot_path = os.path.join(out_dir, "trajectory.png")
    if viz.plot_run(result, seq, plot_path):
        print("plot ->", plot_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
