"""Factor-graph back-end (L5): pose-graph / bundle adjustment over SE(2)
keyframes and marker landmarks.

The reference has no back-end — its map is filter-only and dies with the
process (SURVEY.md sections 3.5, 5.4). This module provides the batch
smoother demanded by BASELINE.md configs 2/4/5: a sparse Gauss-Newton /
Levenberg-Marquardt solver over

- **marker factors**   z = h(pose_k, lm_l) + noise, with h the same
  robot-frame relative observation model as the EKF (z_hat closed form at
  reference src/aruco_slam.cpp:127-134; loop closure falls out of marker
  re-observation since ArUco ids are global — the same trivial data
  association the reference exploits via ``aruco_id_map``, :423-435);
- **odometry factors** z = pose_i ⊖ pose_j between keyframes;
- a **prior** on pose 0 fixing the gauge.

TPU-first design: the normal equations are never materialized as a big
sparse matrix. Landmarks are eliminated by the Schur complement — each
landmark's 3x3 Hll block inverts in closed form, embarrassingly parallel —
and the reduced camera system S dp = bs is solved matrix-free with
preconditioned CG: every S @ v product is a batch of 3x3 matmuls plus
``segment_sum`` scatter-adds over keyframe/landmark indices. All loops are
``lax.scan`` / ``lax.fori_loop`` with static trip counts; everything vmaps
and shard_maps (see parallel.dist_ba: shard observations by landmark owner,
psum the [K, 3]-sized reduced products — that is the only cross-device
traffic per CG iteration).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aruco_slam_tpu.ops import geometry
from aruco_slam_tpu.ops import linalg as small_linalg

Array = jax.Array


class BAProblem(NamedTuple):
    """Fixed-shape factor graph. K keyframes, L landmarks, N marker
    observations, M odometry/relative-pose factors."""

    poses: Array  # [K, 3] initial keyframe poses
    landmarks: Array  # [L, 3] initial landmark states
    obs_kf: Array  # [N] int32 keyframe index
    obs_lm: Array  # [N] int32 landmark index
    obs_z: Array  # [N, 3] measured relative (x, y, theta)
    obs_w: Array  # [N, 3, 3] information matrices (R^{-1})
    obs_valid: Array  # [N] bool
    odo_i: Array  # [M] int32
    odo_j: Array  # [M] int32
    odo_z: Array  # [M, 3]
    odo_w: Array  # [M, 3, 3]
    odo_valid: Array  # [M] bool
    prior_w: Array  # [3, 3] information anchoring pose 0 at its init value


class BAStats(NamedTuple):
    initial_cost: Array
    final_cost: Array
    cost_history: Array  # [iters+1]


def _obs_jacobians(pose: Array, target: Array):
    """h(pose, target) = target in pose frame; returns (h, Jp, Jt).

    Jp/Jt are the analytic 3x6 observation Jacobian halves of the EKF
    (reference Gxm, src/aruco_slam.cpp:140-143), batched."""
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    s, c = jnp.sin(th), jnp.cos(th)
    dx = target[..., 0] - x
    dy = target[..., 1] - y
    h = jnp.stack(
        [
            dx * c + dy * s,
            -dx * s + dy * c,
            geometry.wrap_angle(target[..., 2] - th),
        ],
        axis=-1,
    )
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    Jp = jnp.stack(
        [
            jnp.stack([-c, -s, -dx * s + dy * c], axis=-1),
            jnp.stack([s, -c, -dx * c - dy * s], axis=-1),
            jnp.stack([zero, zero, -one], axis=-1),
        ],
        axis=-2,
    )
    Jt = jnp.stack(
        [
            jnp.stack([c, s, zero], axis=-1),
            jnp.stack([-s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return h, Jp, Jt


def _residuals(problem: BAProblem, poses, landmarks):
    """All whitened residual blocks + Jacobians at the current estimate."""
    # marker factors
    p_obs = poses[problem.obs_kf]
    l_obs = landmarks[problem.obs_lm]
    h, Jp, Jl = _obs_jacobians(p_obs, l_obs)
    r_obs = problem.obs_z - h
    r_obs = r_obs.at[..., 2].set(geometry.wrap_angle(r_obs[..., 2]))
    w_obs = jnp.where(
        problem.obs_valid[:, None, None], problem.obs_w, 0.0
    )
    # odometry factors
    pi = poses[problem.odo_i]
    pj = poses[problem.odo_j]
    ho, Ji, Jj = _obs_jacobians(pi, pj)
    r_odo = problem.odo_z - ho
    r_odo = r_odo.at[..., 2].set(geometry.wrap_angle(r_odo[..., 2]))
    w_odo = jnp.where(
        problem.odo_valid[:, None, None], problem.odo_w, 0.0
    )
    return (r_obs, Jp, Jl, w_obs), (r_odo, Ji, Jj, w_odo)


def cost(problem: BAProblem, poses, landmarks, prior_pose) -> Array:
    (r_obs, _, _, w_obs), (r_odo, _, _, w_odo) = _residuals(
        problem, poses, landmarks
    )
    c_obs = jnp.sum(r_obs[:, None, :] @ w_obs @ r_obs[:, :, None])
    c_odo = jnp.sum(r_odo[:, None, :] @ w_odo @ r_odo[:, :, None])
    r0 = poses[0] - prior_pose
    r0 = r0.at[2].set(geometry.wrap_angle(r0[2]))
    c_pr = r0 @ problem.prior_w @ r0
    return 0.5 * (c_obs + c_odo + c_pr)


def obs_linear_blocks(problem: BAProblem, poses, landmarks, K: int, L: int):
    """Marker-factor linear blocks (the shardable part of the problem).

    Sign convention: residual r = z - h, Jacobians J of h, so the normal
    equations are (J^T W J) d = + J^T W r.

    Returns (Hpp_diag_obs [K,3,3], Hll [L,3,3], Apl [N,3,3], bp_obs [K,3],
    bl [L,3]) — everything keyed by *local* landmark indices, so a shard of
    observations + its owned landmark block compute these independently;
    only Hpp_diag_obs and bp_obs need a psum across shards."""
    (r_obs, Jp, Jl, w_obs), _ = _residuals(problem, poses, landmarks)
    JpW = jnp.swapaxes(Jp, -1, -2) @ w_obs  # [N, 3, 3] = Jp^T W
    JlW = jnp.swapaxes(Jl, -1, -2) @ w_obs
    App = JpW @ Jp
    All = JlW @ Jl
    Apl = JpW @ Jl
    bp_obs = (JpW @ r_obs[..., None])[..., 0]
    bl_obs = (JlW @ r_obs[..., None])[..., 0]
    Hpp_diag = jax.ops.segment_sum(App, problem.obs_kf, num_segments=K)
    Hll = jax.ops.segment_sum(All, problem.obs_lm, num_segments=L)
    bp = jax.ops.segment_sum(bp_obs, problem.obs_kf, num_segments=K)
    bl = jax.ops.segment_sum(bl_obs, problem.obs_lm, num_segments=L)
    return Hpp_diag, Hll, Apl, bp, bl


def odo_linear_blocks(problem: BAProblem, poses, landmarks, K: int):
    """Odometry/relative-pose linear blocks (replicated, cheap)."""
    _, (r_odo, Ji, Jj, w_odo) = _residuals(problem, poses, landmarks)
    JiW = jnp.swapaxes(Ji, -1, -2) @ w_odo
    JjW = jnp.swapaxes(Jj, -1, -2) @ w_odo
    Hpp_diag = jax.ops.segment_sum(JiW @ Ji, problem.odo_i, num_segments=K)
    Hpp_diag = Hpp_diag + jax.ops.segment_sum(
        JjW @ Jj, problem.odo_j, num_segments=K
    )
    Hij = JiW @ Jj  # [M, 3, 3] off-diagonal block (i, j)
    bp = jax.ops.segment_sum(
        (JiW @ r_odo[..., None])[..., 0], problem.odo_i, num_segments=K
    )
    bp = bp + jax.ops.segment_sum(
        (JjW @ r_odo[..., None])[..., 0], problem.odo_j, num_segments=K
    )
    return Hpp_diag, Hij, bp


def _linearize(problem: BAProblem, poses, landmarks, damping):
    """Build the blocks needed by the Schur-CG solve (single device)."""
    K = poses.shape[0]
    L = landmarks.shape[0]
    Hpp_obs, Hll, Apl, bp_obs, bl = obs_linear_blocks(
        problem, poses, landmarks, K, L
    )
    Hpp_odo, Hij, bp_odo = odo_linear_blocks(problem, poses, landmarks, K)
    Hpp_diag = Hpp_obs + Hpp_odo
    bp = bp_obs + bp_odo

    # Prior on pose 0 (gauge)
    Hpp_diag = Hpp_diag.at[0].add(problem.prior_w)

    # LM damping on both diagonals
    eye = jnp.eye(3, dtype=poses.dtype)
    Hpp_diag = Hpp_diag + damping * eye
    Hll = Hll + damping * eye
    Hll_inv = small_linalg.inv3x3(Hll)  # [L, 3, 3] closed-form batched

    return dict(
        Hpp_diag=Hpp_diag, Hll_inv=Hll_inv, Apl=Apl, Hij=Hij,
        bp=bp, bl=bl,
    )


def _schur_matvec(lin, problem: BAProblem, v):
    """S @ v with S = Hpp - Hpl Hll^-1 Hlp, matrix-free.

    v: [K, 3]. All terms are batched 3x3 matmuls + segment sums."""
    K = v.shape[0]
    L = lin["Hll_inv"].shape[0]
    # Hpp @ v: diagonal part
    out = (lin["Hpp_diag"] @ v[..., None])[..., 0]
    # odometry coupling: out_i += Hij v_j ; out_j += Hij^T v_i
    vi = v[problem.odo_j]
    contrib_i = (lin["Hij"] @ vi[..., None])[..., 0]
    out = out + jax.ops.segment_sum(contrib_i, problem.odo_i, num_segments=K)
    vj = v[problem.odo_i]
    contrib_j = (jnp.swapaxes(lin["Hij"], -1, -2) @ vj[..., None])[..., 0]
    out = out + jax.ops.segment_sum(contrib_j, problem.odo_j, num_segments=K)
    # - Hpl Hll^-1 Hlp v
    t = (jnp.swapaxes(lin["Apl"], -1, -2) @ v[problem.obs_kf][..., None])[..., 0]
    t_lm = jax.ops.segment_sum(t, problem.obs_lm, num_segments=L)  # [L, 3]
    u = (lin["Hll_inv"] @ t_lm[..., None])[..., 0]  # [L, 3]
    back = (lin["Apl"] @ u[problem.obs_lm][..., None])[..., 0]  # [N, 3]
    out = out - jax.ops.segment_sum(back, problem.obs_kf, num_segments=K)
    return out


def gauge_rotation_mode(poses: Array) -> Array:
    """The near-flat eigen-direction of the reduced camera system: a global
    rotation of all keyframes about the anchored pose 0.

    Global map orientation is pinned only through the odometry chain back to
    the pose-0 prior, so this mode's curvature is orders of magnitude below
    the rest of the spectrum and block-Jacobi CG crawls along it
    (docs/PERFORMANCE.md 'BA convergence note'). Per keyframe k the
    infinitesimal generator is d(x_k, y_k, th_k)/d(phi) =
    (-(y_k - y_0), x_k - x_0, 1). Normalized."""
    d = poses[:, :2] - poses[0, :2]
    v = jnp.stack([-d[:, 1], d[:, 0], jnp.ones_like(d[:, 0])], axis=-1)
    return v / jnp.linalg.norm(v)


def _pcg(lin, problem: BAProblem, rhs, iters: int, deflate: Array | None = None):
    """Preconditioned CG on the reduced system; block-Jacobi preconditioner
    from the Hpp diagonal blocks.

    ``deflate`` (optional [K, 3]) is a deflation vector: its 1-D component
    of the solution is computed directly up front (alpha = v.b / v.Sv — a
    well-conditioned ratio even when both are tiny) and the Krylov space is
    kept S-orthogonal to it, so a near-flat mode no longer throttles
    convergence. Cost: one extra matvec up front, one dot + axpy per
    iteration."""
    Minv = small_linalg.inv3x3(lin["Hpp_diag"])

    def precond(r):
        return (Minv @ r[..., None])[..., 0]

    if deflate is not None:
        v = deflate
        Sv = _schur_matvec(lin, problem, v)
        vSv = jnp.sum(v * Sv)
        safe_vSv = jnp.where(jnp.abs(vSv) < 1e-30, 1e-30, vSv)
        x0 = v * (jnp.sum(v * rhs) / safe_vSv)
        r0 = rhs - Sv * (jnp.sum(v * rhs) / safe_vSv)

        def project(z):
            return z - v * (jnp.sum(Sv * z) / safe_vSv)
    else:
        x0 = jnp.zeros_like(rhs)
        r0 = rhs

        def project(z):
            return z

    z0 = project(precond(r0))
    p0 = z0

    def body(carry, _):
        x, r, z, p, rz = carry
        Sp = _schur_matvec(lin, problem, p)
        denom = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Sp
        z = project(precond(r))
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new), jnp.sum(r * r)

    rz0 = jnp.sum(r0 * z0)
    (x, r, _, _, _), res_hist = jax.lax.scan(
        body, (x0, r0, z0, p0, rz0), None, length=iters
    )
    return x, res_hist


def solve(
    problem: BAProblem,
    iters: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    adaptive: bool = False,
    deflate_gauge: bool = False,
):
    """Run Gauss-Newton / Levenberg-Marquardt with Schur-complement CG.
    Returns (poses, landmarks, BAStats).

    ``adaptive``: LM accept/reject — re-evaluate the cost after each step;
    on increase, reject the step and raise the damping 10x (capped), on
    decrease accept and relax it 2x toward the ``damping`` floor. One extra
    cost evaluation per iteration; with ``adaptive=False`` the behavior is
    the round-1 fixed-damping GN, bit-identical.

    ``deflate_gauge``: deflate the near-flat global-rotation gauge mode out
    of CG and solve its 1-D component directly (see
    :func:`gauge_rotation_mode`) — closes the block-Jacobi crawl along that
    mode that previously demanded 60x400 iterations for convergence on
    loop-closure problems."""
    prior_pose = problem.poses[0]
    lam_floor = jnp.asarray(damping, problem.poses.dtype)

    def gn_step(carry, _):
        poses, landmarks, lam, last_cost = carry
        lin = _linearize(problem, poses, landmarks, lam)
        # prior residual into bp[0]
        r0 = prior_pose - poses[0]
        r0 = r0.at[2].set(geometry.wrap_angle(r0[2]))
        bp = lin["bp"].at[0].add(problem.prior_w @ r0)
        # reduced rhs: bs = bp - Hpl Hll^-1 bl
        L = landmarks.shape[0]
        u = (lin["Hll_inv"] @ lin["bl"][..., None])[..., 0]
        back = (lin["Apl"] @ u[problem.obs_lm][..., None])[..., 0]
        bs = bp - jax.ops.segment_sum(
            back, problem.obs_kf, num_segments=poses.shape[0]
        )
        deflate = gauge_rotation_mode(poses) if deflate_gauge else None
        dp, _ = _pcg(lin, problem, bs, cg_iters, deflate=deflate)
        # back-substitute landmarks: dl = Hll^-1 (bl - Hlp dp)
        t = (jnp.swapaxes(lin["Apl"], -1, -2) @ dp[problem.obs_kf][..., None])[
            ..., 0
        ]
        t_lm = jax.ops.segment_sum(t, problem.obs_lm, num_segments=L)
        dl = (lin["Hll_inv"] @ (lin["bl"] - t_lm)[..., None])[..., 0]
        new_poses = poses + dp
        new_poses = new_poses.at[:, 2].set(geometry.wrap_angle(new_poses[:, 2]))
        new_landmarks = landmarks + dl
        new_landmarks = new_landmarks.at[:, 2].set(
            geometry.wrap_angle(new_landmarks[:, 2])
        )
        c = cost(problem, new_poses, new_landmarks, prior_pose)
        if adaptive:
            accept = c <= last_cost
            poses = jnp.where(accept, new_poses, poses)
            landmarks = jnp.where(accept, new_landmarks, landmarks)
            lam = jnp.where(
                accept,
                jnp.maximum(lam * 0.5, lam_floor),
                jnp.minimum(lam * 10.0, 1e4),
            )
            c = jnp.where(accept, c, last_cost)
        else:
            poses, landmarks = new_poses, new_landmarks
        return (poses, landmarks, lam, c), c

    c0 = cost(problem, problem.poses, problem.landmarks, prior_pose)
    (poses, landmarks, _, _), costs = jax.lax.scan(
        gn_step, (problem.poses, problem.landmarks, lam_floor, c0), None,
        length=iters,
    )
    history = jnp.concatenate([c0[None], costs])
    return poses, landmarks, BAStats(
        initial_cost=c0, final_cost=history[-1], cost_history=history
    )
