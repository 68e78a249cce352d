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
    keyframe_stride: int = 4,
    ba_iters: int = 60,
    cg_iters: int = 400,
    damping: float = 1e-4,
):
    """Full offline pipeline. Returns a dict with the EKF result, the BA
    problem, refined poses/landmarks, landmark ids and BA stats.

    Default iteration counts are set for full convergence, not speed: the
    marker-SLAM posterior has a near-flat mode (global orientation is pinned
    only through the odometry chain back to the prior on keyframe 0), and
    block-Jacobi PCG crawls along it — on the 100-marker loop benchmark,
    12 GN x 120 CG leaves ~70% excess map error vs the converged solution
    (0.37 m vs 0.21 m mean landmark error) even though the total cost agrees
    to 4 significant figures. 60 GN x 400 CG is converged (map error
    unchanged vs 300 x 800) and costs ~4 s at 525 keyframes / 100 landmarks
    on one chip."""
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
    problem_j = jax.tree.map(jnp.asarray, problem)
    poses, landmarks, stats = jax.jit(
        lambda p: ba.solve(p, iters=ba_iters, cg_iters=cg_iters, damping=damping),
        static_argnums=(),
    )(problem_j)
    return {
        "ekf_result": ekf_result,
        "problem": problem,
        "poses": poses,
        "landmarks": landmarks,
        "landmark_ids": lm_ids,
        "stats": stats,
    }
