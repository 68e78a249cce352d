"""High-level pipelines (L4/L5 composition): filter -> smoother.

The reference stops at the filter (its map dies with the process,
SURVEY.md section 5.4). This module provides the batch pipeline on top:
run the EKF online pass, then refine trajectory + map with the
Schur-complement BA backend initialized from the filter output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu import runner
from aruco_slam_tpu.models import ba, ekf as ekf_mod, graph_builder
from aruco_slam_tpu.utils.config import SlamConfig


def ekf_then_ba(
    seq,
    config: SlamConfig,
    camera=None,
    level: str = "obs",
    keyframe_stride: int = 1,
    ba_iters: int = 20,
    cg_iters: int = 200,
    damping: float = 1e-4,
    adaptive: bool = True,
    deflate_gauge: bool = True,
):
    """Full offline pipeline. Returns a dict with the EKF result, the BA
    problem, refined poses/landmarks, landmark ids and BA stats.

    Defaults are set from the round-2 config-2 study (benchmarks/config2_*.py
    probes):

    - The marker-SLAM posterior has a near-flat mode (global orientation is
      pinned only through the odometry chain back to the prior on keyframe
      0) and block-Jacobi PCG crawls along it. ``deflate_gauge=True`` solves
      that 1-D component directly and keeps the Krylov space S-orthogonal to
      it: 20 GN x 200 CG then matches what plain GN needed 60 x 400 for
      (a 6x iteration saving at equal solution).
    - The remaining error floor at keyframe_stride=4 (0.21 m mean landmark
      error on the 100-marker loop) is *posterior-side*, not solver-side — a
      dense float64 exact-GN oracle stalls at the same 0.2138 m (see
      benchmarks/config2_oracle_probe.py). Densifying the factor graph to
      ``keyframe_stride=1`` stiffens the flat "slow bend" valley and pulls
      the MAP solution to 0.131 m — within 10% of the 0.12 m reached from a
      ground-truth init.
    - ``adaptive=True`` (LM accept/reject) guards the larger stride-1
      system against occasional cost-increasing steps at low damping."""
    if camera is None:
        camera = seq.camera()  # the calibration the sequence carries
    data = runner.replay_data_from_sequence(seq, level)
    ekf_result = runner.replay(data, config, camera, level)
    traj = np.asarray(ekf_result.trajectory)

    lms, ids, active = ekf_mod.get_map(ekf_result.final_state, config)
    lms = np.asarray(lms)
    ids = np.asarray(ids)
    active = np.asarray(active)
    init_landmarks = {
        int(ids[k]): lms[k] for k in range(len(ids)) if active[k]
    }

    problem, lm_ids = graph_builder.build_from_sequence(
        seq, config, keyframe_stride=keyframe_stride,
        init_poses=traj, init_landmarks=init_landmarks,
    )
    packed, tables, static = ba.prepare(problem)
    poses, landmarks, stats = jax.jit(
        lambda p, t: ba.solve(
            p, iters=ba_iters, cg_iters=cg_iters, damping=damping,
            adaptive=adaptive, deflate_gauge=deflate_gauge, tables=t,
            **static,
        ),
    )(packed, tables)
    return {
        "ekf_result": ekf_result,
        "problem": problem,
        "poses": poses,
        "landmarks": landmarks,
        "landmark_ids": lm_ids,
        "stats": stats,
    }
