"""Pose-graph optimization (L5) — the landmark-free specialization of the
factor-graph backend.

A pose graph is a BAProblem with only relative-pose factors (odometry chain
+ loop closures); the Schur stage degenerates away and the solver reduces
to preconditioned CG on the pose block. This thin API packages that for the
loop-closure workflow (BASELINE.md config 2): build from an odometry chain
plus marker-derived loop-closure constraints, solve with ``models.ba``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.models import ba
from aruco_slam_tpu.models.ba import BAProblem


class PoseGraph(NamedTuple):
    problem: BAProblem


def build(
    initial_poses: np.ndarray,  # [K, 3]
    odometry: np.ndarray,  # [K-1, 3] relative motions i -> i+1
    odo_info: float | np.ndarray = 1e4,
    closures: list | None = None,  # [(i, j, z_rel [3], info 3x3 or float)]
    prior_info: float = 1e8,
    dtype=np.float32,
) -> PoseGraph:
    K = len(initial_poses)
    eye = np.eye(3)
    odo_i = list(range(K - 1))
    odo_j = list(range(1, K))
    odo_z = [np.asarray(z, float) for z in odometry]
    odo_w = [np.asarray(odo_info * eye if np.isscalar(odo_info) else odo_info, float)] * (K - 1)
    for c in closures or []:
        i, j, z, info = c
        odo_i.append(int(i))
        odo_j.append(int(j))
        odo_z.append(np.asarray(z, float))
        odo_w.append(np.asarray(info * eye if np.isscalar(info) else info, float))
    m = len(odo_i)
    problem = BAProblem(
        poses=np.asarray(initial_poses, dtype),
        landmarks=np.zeros((1, 3), dtype),
        obs_kf=np.zeros((1,), np.int32),
        obs_lm=np.zeros((1,), np.int32),
        obs_z=np.zeros((1, 3), dtype),
        obs_w=np.zeros((1, 3, 3), dtype),
        obs_valid=np.zeros((1,), bool),
        odo_i=np.asarray(odo_i, np.int32),
        odo_j=np.asarray(odo_j, np.int32),
        odo_z=np.asarray(odo_z, dtype).reshape(m, 3),
        odo_w=np.asarray(odo_w, dtype).reshape(m, 3, 3),
        odo_valid=np.ones((m,), bool),
        prior_w=(prior_info * eye).astype(dtype),
    )
    return PoseGraph(problem=problem)


def solve(
    graph: PoseGraph, iters: int = 8, cg_iters: int = 80, damping: float = 1e-4
):
    """Returns (optimized poses [K, 3], BAStats)."""
    problem = jax.tree.map(jnp.asarray, graph.problem)
    poses, _, stats = jax.jit(
        lambda p: ba.solve(p, iters=iters, cg_iters=cg_iters, damping=damping)
    )(problem)
    return poses, stats
