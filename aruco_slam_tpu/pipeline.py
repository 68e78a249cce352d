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

import functools


@functools.lru_cache(maxsize=None)
def _solve_jit(iters, cg_iters, damping, adaptive, deflate_gauge,
               kf_width, odo_chain):
    """Cached jitted solver: a fresh ``jax.jit(lambda ...)`` per call is a
    new cache key and re-traces every invocation (the dist_ba round-4 bug
    class) — key the wrapper by its static solver options instead."""
    return jax.jit(
        lambda p, t: ba.solve(
            p, iters=iters, cg_iters=cg_iters, damping=damping,
            adaptive=adaptive, deflate_gauge=deflate_gauge, tables=t,
            kf_width=kf_width, odo_chain=odo_chain,
        )
    )


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
    poses, landmarks, stats = _solve_jit(
        ba_iters, cg_iters, damping, adaptive, deflate_gauge,
        static["kf_width"], static["odo_chain"],
    )(packed, tables)
    return {
        "ekf_result": ekf_result,
        "problem": problem,
        "poses": poses,
        "landmarks": landmarks,
        "landmark_ids": lm_ids,
        "stats": stats,
    }


def _se2_compose(a, b):
    """SE(2) compose a ⊕ b (numpy, batched on leading dims)."""
    c, s = np.cos(a[..., 2]), np.sin(a[..., 2])
    return np.stack(
        [
            a[..., 0] + c * b[..., 0] - s * b[..., 1],
            a[..., 1] + s * b[..., 0] + c * b[..., 1],
            np.arctan2(
                np.sin(a[..., 2] + b[..., 2]), np.cos(a[..., 2] + b[..., 2])
            ),
        ],
        axis=-1,
    )


def _se2_inverse(a):
    c, s = np.cos(a[..., 2]), np.sin(a[..., 2])
    return np.stack(
        [
            -(c * a[..., 0] + s * a[..., 1]),
            -(-s * a[..., 0] + c * a[..., 1]),
            -a[..., 2],
        ],
        axis=-1,
    )


def ekf_then_pose_graph(
    seq,
    config: SlamConfig,
    camera=None,
    level: str = "obs",
    keyframe_stride: int = 1,
    iters: int = 12,
    cg_iters: int = 100,
    damping: float = 1e-4,
):
    """Loop closure via marker re-observation + POSE-GRAPH optimization —
    the exact formulation BASELINE.md config 2 names. The landmark block is
    eliminated *before* the solve rather than by the Schur complement: each
    marker seen at keyframes i (first) and j yields a relative-pose factor
    z_ij = z_i ⊕ z_j^{-1} (both keyframes see the same world-fixed marker:
    T_w_i ⊕ z_i = T_w_j ⊕ z_j, so T_i_j = z_i ⊕ z_j^{-1}), a star of
    closures anchored at the marker's first observation. Closure
    information is approximated as (R_i + R_j)^{-1} — the composition
    Jacobians are near-orthonormal rotations, so this is conservative
    within the rotation of R_j. After the pose solve, landmarks are
    re-composed from the optimized poses as the information-weighted mean
    of pose_k ⊕ z_k over each marker's observations (circular mean on the
    angle).

    Measured against :func:`ekf_then_ba` on the config-2 leg in
    benchmarks/run_all.py (`config2_loop_100_markers.pose_graph`) — the
    comparison that decides which solver the config ships with."""
    from aruco_slam_tpu.models import pose_graph

    if camera is None:
        camera = seq.camera()
    data = runner.replay_data_from_sequence(seq, level)
    ekf_result = runner.replay(data, config, camera, level)
    traj = np.asarray(ekf_result.trajectory)

    problem, lm_ids = graph_builder.build_from_sequence(
        seq, config, keyframe_stride=keyframe_stride, init_poses=traj,
    )
    obs_kf = np.asarray(problem.obs_kf)
    obs_lm = np.asarray(problem.obs_lm)
    obs_z = np.asarray(problem.obs_z, np.float64)
    obs_w = np.asarray(problem.obs_w, np.float64)
    K = np.asarray(problem.poses).shape[0]
    L = np.asarray(problem.landmarks).shape[0]

    # chain closures per landmark: each observation links to the marker's
    # PREVIOUS observation (a chain, not a star anchored at the first
    # observation: a popular marker's anchor keyframe would otherwise
    # carry hundreds of factors and blow the padded odo row table up to
    # [K, max_degree] mostly-padding; the chain bounds per-keyframe factor
    # degree by the frame's marker count and still closes loops — the
    # last-obs-of-visit-1 -> first-obs-of-visit-2 link carries the
    # re-observation constraint)
    closures = []
    prev = {}
    obs_R = np.linalg.inv(obs_w + 1e-12 * np.eye(3))
    for n in range(len(obs_kf)):
        m = int(obs_lm[n])
        if m in prev:
            a = prev[m]
            i, j = int(obs_kf[a]), int(obs_kf[n])
            if i != j:
                z_ij = _se2_compose(obs_z[a], _se2_inverse(obs_z[n]))
                info = np.linalg.inv(obs_R[a] + obs_R[n])
                closures.append((i, j, z_ij, info))
        prev[m] = n

    graph = pose_graph.build(
        np.asarray(problem.poses),
        np.asarray(problem.odo_z),
        odo_info=np.asarray(problem.odo_w)[0],
        closures=closures,
        dtype=np.float32,
    )
    # per-factor odometry information (build() broadcasts one matrix;
    # restore the chain's own)
    g_problem = graph.problem._replace(
        odo_w=np.concatenate(
            [
                np.asarray(problem.odo_w),
                np.asarray([c[3] for c in closures], np.float32).reshape(
                    -1, 3, 3
                ),
            ]
        ).astype(np.float32)
    )
    packed, tables, static = ba.prepare(g_problem)
    poses, _, stats = _solve_jit(
        iters, cg_iters, damping, True, True,
        static["kf_width"], static["odo_chain"],
    )(packed, tables)
    poses_np = np.asarray(poses, np.float64)

    # landmark recomposition: info-weighted mean of pose_k ⊕ z_k — the
    # xy block solves with the 2x2 position information; the angle takes
    # the trace-weighted circular mean
    lm_world = _se2_compose(poses_np[obs_kf], obs_z)  # [N, 3]
    acc_w = np.zeros((L, 2, 2))
    acc_xy = np.zeros((L, 2))
    acc_cs = np.zeros((L, 2))
    for n in range(len(obs_kf)):
        m = int(obs_lm[n])
        w2 = obs_w[n][:2, :2]
        acc_w[m] += w2
        acc_xy[m] += w2 @ lm_world[n, :2]
        tr = np.trace(obs_w[n])
        acc_cs[m, 0] += tr * np.cos(lm_world[n, 2])
        acc_cs[m, 1] += tr * np.sin(lm_world[n, 2])
    landmarks = np.zeros((L, 3))
    landmarks[:, :2] = np.linalg.solve(
        acc_w + 1e-12 * np.eye(2), acc_xy[:, :, None]
    )[:, :, 0]
    landmarks[:, 2] = np.arctan2(acc_cs[:, 1], acc_cs[:, 0])

    return {
        "ekf_result": ekf_result,
        "poses": poses,
        "landmarks": landmarks.astype(np.float32),
        "landmark_ids": lm_ids,
        "stats": stats,
        "n_closures": len(closures),
    }
