"""EKF-SLAM core (L1) — TPU-native re-design of the reference estimator.

Reimplements the joint pose+landmark EKF of ``ArucoSlam`` (reference
src/aruco_slam.cpp): *predict* from differential-drive encoders
(``addEncoder``, :12-74) and sequential per-marker *update* with online
landmark augmentation (``addImage``, :76-287) — but TPU-first:

- **Fixed-capacity masked state.** The reference grows ``mu_``/``sigma_``
  dynamically (src/aruco_slam.cpp:215-225,246-253); XLA needs static shapes,
  so the state is pre-allocated for ``max_landmarks`` slots with an active
  count. Inactive rows/columns are exactly zero, which leaves the Kalman
  gain and covariance updates bit-identical to the growing-matrix math
  (zero rows of sigma produce zero gain rows).
- **Sequential updates under ``lax.scan``.** The reference's per-marker
  while-loop (ascending map index, new markers first — the inverted
  ``ArucoMarker::operator<`` at aruco_slam.h:85-88) becomes a scan over a
  sorted, masked observation batch, preserving the order-dependent
  semantics including the *stale linearization point*: all ``z_hat`` and
  Jacobians use the frame-start mean (``Eigen::MatrixXd mu = mu_`` at
  src/aruco_slam.cpp:88) while corrections accumulate into the live mean.
- **Structured covariance algebra.** Rather than forming the N x N
  ``Hx``/``F`` selector matrices (src/aruco_slam.cpp:64-73,112-116), the
  predict touches only the 3 pose rows/cols and the update uses the 6
  nonzero observation-Jacobian columns, turning the O(N^3)-ish dense
  products into O(N) row/col updates and one rank-3 N x N correction.

All reference quirks are reproduced or gated per SURVEY.md section 7.1 via
``CompatConfig``; see the inline notes.

Everything here is pure: ``(state, input) -> state``; jit/vmap/scan safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aruco_slam_tpu.ops import geometry, linalg
from aruco_slam_tpu.utils.config import SlamConfig

Array = jax.Array


class EkfState(NamedTuple):
    """Joint Gaussian over (pose, landmarks) plus bookkeeping.

    Mirrors the reference members ``mu_``/``sigma_``/``aruco_id_map``/
    ``last_observed_marker_`` (aruco_slam.h:164,182-188) as fixed-shape
    arrays. ``N = 3 + 3 * max_landmarks``.
    """

    mu: Array  # [N] mean: (x, y, theta, m1x, m1y, m1th, ...)
    sigma: Array  # [N, N] covariance; inactive rows/cols are zero
    slot_ids: Array  # [max_lm] int32 marker id per slot, -1 if empty
    n_landmarks: Array  # [] int32 active landmark count
    last_obs: Array  # [max_lm, 3] last accepted measurement per slot
    seen_prev: Array  # [max_lm] bool: processed in the previous frame
    initialized: Array  # [] bool: first-encoder latch (is_init_, :24-29)
    diverged: Array  # [] int32: count of log-only divergence hits (:156-175)
    dropped: Array  # [] int32: observations dropped (capacity / rejection)


class FrameObservations(NamedTuple):
    """One image frame's marker observations, padded to a static width.

    Produced by the vision front-end (detection + PnP + gating); the EKF
    only sees ``(id, z, R, valid)`` — the same seam as the reference's
    ``obs_`` queue (aruco_slam.h:190).
    """

    ids: Array  # [M] int32 marker ids (-1 for padding)
    z: Array  # [M, 3] measurements (x, y, theta) in robot frame
    R: Array  # [M, 3, 3] observation covariances
    valid: Array  # [M] bool


class Control(NamedTuple):
    """One encoder tick: wheel angular velocities + integration interval.

    The reference uses wall-clock receive time for dt (src/aruco_slam.cpp:31
    — quirk (a)); we take dt from data timestamps for deterministic replay.
    """

    wl: Array
    wr: Array
    dt: Array


def init_state(config: SlamConfig, dtype=jnp.float32) -> EkfState:
    """Fresh state: 3-dof pose at origin with zero covariance
    (reference ctor, src/aruco_slam.cpp:13-16)."""
    max_lm = config.ekf.max_landmarks
    n = 3 + 3 * max_lm
    return EkfState(
        mu=jnp.zeros((n,), dtype),
        sigma=jnp.zeros((n, n), dtype),
        slot_ids=jnp.full((max_lm,), -1, jnp.int32),
        n_landmarks=jnp.zeros((), jnp.int32),
        last_obs=jnp.zeros((max_lm, 3), dtype),
        seen_prev=jnp.zeros((max_lm,), bool),
        initialized=jnp.zeros((), bool),
        diverged=jnp.zeros((), jnp.int32),
        dropped=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Predict (reference addEncoder, src/aruco_slam.cpp:21-74)
# ---------------------------------------------------------------------------


def predict(state: EkfState, control: Control, config: SlamConfig) -> EkfState:
    """EKF predict from one encoder tick.

    Mean: midpoint-arc differential-drive model (src/aruco_slam.cpp:35-52).
    Covariance: sigma <- Hx sigma Hx^T + F Qk F^T (src/aruco_slam.cpp:55-73),
    computed structurally — Hx differs from identity only in the top-left
    3x3, so only 3 rows + 3 cols of sigma are touched.
    """
    odom = config.odom
    cov = config.covariance
    wl, wr, dt = control.wl, control.wr, control.dt

    delta_sl = odom.kl * dt * wl
    delta_sr = odom.kr * dt * wr
    delta_theta = (delta_sr - delta_sl) / (2.0 * odom.b)
    delta_s = 0.5 * (delta_sr + delta_sl)

    tmp_th = state.mu[2] + 0.5 * delta_theta
    c, s = jnp.cos(tmp_th), jnp.sin(tmp_th)

    new_pose = jnp.stack(
        [
            state.mu[0] + delta_s * c,
            state.mu[1] + delta_s * s,
            geometry.wrap_angle(state.mu[2] + delta_theta),
        ]
    )
    mu = state.mu.at[:3].set(new_pose)

    # Pose Jacobian H_xi (src/aruco_slam.cpp:55-58)
    dtype = state.mu.dtype
    H_xi = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype
    )
    H_xi = H_xi.at[0, 2].set(-delta_s * s).at[1, 2].set(delta_s * c)

    # Control-noise Jacobian. Quirk (b): the reference scales BOTH columns
    # by kl (src/aruco_slam.cpp:60-62); the corrected form uses kl and kr.
    if config.compat.process_noise_uses_kl_for_both_wheels:
        wkh = (0.5 * odom.kl * dt) * jnp.stack(
            [
                jnp.stack([c, c]),
                jnp.stack([s, s]),
                jnp.stack([1.0 / odom.b, -1.0 / odom.b]),
            ]
        )
    else:
        half_dt = 0.5 * dt
        wkh = half_dt * jnp.stack(
            [
                jnp.stack([odom.kl * c, odom.kr * c]),
                jnp.stack([odom.kl * s, odom.kr * s]),
                jnp.stack([odom.kl / odom.b, -odom.kr / odom.b]),
            ]
        )
    sigma_u = jnp.diag(jnp.stack([cov.Q_k * jnp.abs(wl), cov.Q_k * jnp.abs(wr)]))
    Qk = wkh @ sigma_u @ wkh.T  # 3x3

    # sigma <- Hx sigma Hx^T + blockdiag(Qk, 0): only rows/cols 0..2 change.
    sigma = state.sigma
    sigma = sigma.at[:3, :].set(H_xi @ sigma[:3, :])
    sigma = sigma.at[:, :3].set(sigma[:, :3] @ H_xi.T)
    sigma = sigma.at[:3, :3].add(Qk.astype(dtype))

    # First-encoder latch (src/aruco_slam.cpp:24-29): the reference only
    # records the time and integrates nothing. We model it by gating the
    # whole effect on `initialized`.
    mu = jnp.where(state.initialized, mu, state.mu)
    sigma = jnp.where(state.initialized, sigma, state.sigma)
    return state._replace(
        mu=mu, sigma=sigma, initialized=jnp.ones((), bool)
    )


def predict_block(state: EkfState, controls: Control, config: SlamConfig) -> EkfState:
    """Fused predict over a block of encoder ticks (e.g. all ticks between
    two camera frames).

    Algebraically identical to folding :func:`predict` over the ticks: every
    per-tick ``Hx`` is identity outside the pose block and ``Qk`` adds only
    into it, so the composition stays a 3x3 pair —

        A <- H_k A,   Q <- H_k Q H_k^T + Qk_k

    accumulated by a cheap 3-vector/3x3 ``lax.scan``, after which the big
    [N, N] covariance is touched ONCE (rows' = A sigma[0:3,:], symmetric
    cols, + Q) instead of once per tick — a ~tick-count reduction in sigma
    traffic for the replay hot loop.

    The first-encoder latch consumes the first tick of the first block, as
    in :func:`predict` (reference src/aruco_slam.cpp:24-29).
    """
    odom = config.odom
    cov = config.covariance
    dtype = state.mu.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def tick(carry, ctrl):
        pose, A, Q, initialized = carry
        wl, wr, dt = ctrl
        delta_sl = odom.kl * dt * wl
        delta_sr = odom.kr * dt * wr
        delta_theta = (delta_sr - delta_sl) / (2.0 * odom.b)
        delta_s = 0.5 * (delta_sr + delta_sl)
        tmp_th = pose[2] + 0.5 * delta_theta
        c, s = jnp.cos(tmp_th), jnp.sin(tmp_th)
        new_pose = jnp.stack(
            [
                pose[0] + delta_s * c,
                pose[1] + delta_s * s,
                geometry.wrap_angle(pose[2] + delta_theta),
            ]
        )
        H = eye3.at[0, 2].set(-delta_s * s).at[1, 2].set(delta_s * c)
        if config.compat.process_noise_uses_kl_for_both_wheels:
            wkh = (0.5 * odom.kl * dt) * jnp.stack(
                [
                    jnp.stack([c, c]),
                    jnp.stack([s, s]),
                    jnp.stack([1.0 / odom.b, -1.0 / odom.b]),
                ]
            )
        else:
            wkh = (0.5 * dt) * jnp.stack(
                [
                    jnp.stack([odom.kl * c, odom.kr * c]),
                    jnp.stack([odom.kl * s, odom.kr * s]),
                    jnp.stack([odom.kl / odom.b, -odom.kr / odom.b]),
                ]
            )
        sigma_u = jnp.diag(
            jnp.stack([cov.Q_k * jnp.abs(wl), cov.Q_k * jnp.abs(wr)])
        )
        Qk = (wkh @ sigma_u @ wkh.T).astype(dtype)
        A_new = (H @ A).astype(dtype)
        Q_new = (H @ Q @ H.T + Qk).astype(dtype)
        # pre-init latch: this tick contributes nothing
        pose = jnp.where(initialized, new_pose, pose)
        A = jnp.where(initialized, A_new, A)
        Q = jnp.where(initialized, Q_new, Q)
        return (pose, A, Q, jnp.ones((), bool)), None

    init = (state.mu[:3], eye3, jnp.zeros((3, 3), dtype), state.initialized)
    (pose, A, Q, _), _ = jax.lax.scan(
        tick, init, (controls.wl, controls.wr, controls.dt)
    )

    mu = state.mu.at[:3].set(pose)
    sigma = state.sigma
    sigma = sigma.at[:3, :].set(A @ sigma[:3, :])
    sigma = sigma.at[:, :3].set(sigma[:, :3] @ A.T)
    sigma = sigma.at[:3, :3].add(Q)
    return state._replace(mu=mu, sigma=sigma, initialized=jnp.ones((), bool))


# ---------------------------------------------------------------------------
# Update (reference addImage, src/aruco_slam.cpp:76-287)
# ---------------------------------------------------------------------------


def _slot_selector(slot, n_dim, dtype):
    """One-hot row selector E [3, N] for landmark ``slot``'s block.

    Replaces dynamic_slice/gather: E @ x reads the block, E.T @ y writes it.
    Under vmap these become batched matmuls (MXU) instead of gathers —
    the reason batched replay scales."""
    idx = 3 + 3 * slot
    iota = jnp.arange(n_dim, dtype=jnp.int32)
    return (iota[None, :] == (idx + jnp.arange(3, dtype=jnp.int32))[:, None]).astype(dtype)


def _known_landmark_update(mu, sigma, mu0, slot, z, Rk, seen_prev, last_obs, cfg: SlamConfig):
    """Sequential EKF correction for an existing landmark
    (src/aruco_slam.cpp:108-207). Returns (mu', sigma', new_last_obs_entry,
    diverged_flag, applied_flag)."""
    dtype = mu.dtype
    E = _slot_selector(slot, mu.shape[0], dtype)

    # Stale linearization point (frame-start mean), :119-134
    x, y, th = mu0[0], mu0[1], mu0[2]
    m = E @ mu0
    sth, cth = jnp.sin(th), jnp.cos(th)
    gdx = m[0] - x
    gdy = m[1] - y
    gdth = geometry.wrap_angle(m[2] - th)
    z_hat = jnp.stack([gdx * cth + gdy * sth, -gdx * sth + gdy * cth, gdth])
    ze = z - z_hat
    ze = ze.at[2].set(geometry.wrap_angle(ze[2]))

    # Observation Jacobian Gxm (3x6), :140-143
    Gp = jnp.stack(
        [
            jnp.stack([-cth, -sth, -gdx * sth + gdy * cth]),
            jnp.stack([sth, -cth, -gdx * cth - gdy * sth]),
            jnp.stack([jnp.zeros_like(cth), jnp.zeros_like(cth), -jnp.ones_like(cth)]),
        ]
    ).astype(dtype)
    Gl = jnp.stack(
        [
            jnp.stack([cth, sth, jnp.zeros_like(cth)]),
            jnp.stack([-sth, cth, jnp.zeros_like(cth)]),
            jnp.stack([jnp.zeros_like(cth), jnp.zeros_like(cth), jnp.ones_like(cth)]),
        ]
    ).astype(dtype)

    # Gx = Gxm F has nonzero columns only at [0:3] and the landmark block,
    # so B = Gx sigma needs just the pose rows and E-selected rows.
    sig_pose = sigma[:3, :]  # [3, N]
    sig_lm = E @ sigma  # [3, N]
    B = Gp @ sig_pose + Gl @ sig_lm  # [3, N] = Gx sigma
    S = B[:, :3] @ Gp.T + (B @ E.T) @ Gl.T + Rk.astype(dtype)
    # K = sigma Gx^T S^-1 = B^T S^-1 (sigma symmetric, S symmetric);
    # closed-form 3x3 solve (batched LU is loop-lowered on TPU) instead of
    # the reference's explicit .inverse() (:146).
    K = linalg.solve3x3(S, B).T  # [N, 3]

    # Divergence check — log-only in the reference (:156-175), optionally a
    # real gate (quirk (d)).
    k_norm = jnp.linalg.norm(K)
    diverged = jnp.logical_or(
        jnp.linalg.norm(ze) >= cfg.compat.divergence_ze_norm,
        k_norm >= cfg.compat.divergence_k_norm,
    )

    mu_new = mu + K @ ze
    sigma_new = sigma - K @ B  # (I - K Gx) sigma

    # Stationary gate (quirk (c), :192-198): when the marker was seen last
    # frame with a near-identical measurement, the "pose-only" update is an
    # empty-block no-op — effective behavior: skip, and leave the recorded
    # last observation *unset* (reference pushes an uninitialized vector;
    # we define it as zeros).
    gate = jnp.zeros((), bool)
    if cfg.compat.stationary_gate:
        gate = jnp.logical_and(
            seen_prev,
            jnp.linalg.norm(last_obs - z) < cfg.compat.stationary_gate_eps,
        )
    reject = jnp.zeros((), bool)
    if cfg.compat.reject_divergent:
        reject = diverged
    skip = jnp.logical_or(gate, reject)

    mu_out = jnp.where(skip, mu, mu_new)
    sigma_out = jnp.where(skip, sigma, sigma_new)
    new_last_obs = jnp.where(gate, jnp.zeros_like(z), z)
    return mu_out, sigma_out, new_last_obs, diverged, jnp.logical_not(skip)


def _new_landmark_insert(mu, sigma, mu0, slot, z, Rk):
    """Augment the state with a new landmark (src/aruco_slam.cpp:208-260).

    Uses the stale pose (mu0) for the landmark's world pose and Jacobians —
    including the reference's f32 downcast of sin/cos (``float sinth``,
    :210-211) which is our native precision anyway — and the *current*
    sigma for the cross-covariance (:230,244).

    All writes go through the one-hot selector (slot entries are exactly
    zero pre-augmentation, so adds == sets) — no scatters.
    """
    dtype = mu.dtype
    E = _slot_selector(slot, mu.shape[0], dtype)
    sth, cth = jnp.sin(mu0[2]), jnp.cos(mu0[2])
    map_x = mu0[0] + cth * z[0] - sth * z[1]
    map_y = mu0[1] + sth * z[0] + cth * z[1]
    map_th = geometry.wrap_angle(mu0[2] + z[2])
    mu_new = mu + E.T @ jnp.stack([map_x, map_y, map_th]).astype(dtype)

    dx = map_x - mu0[0]
    dy = map_y - mu0[1]
    zero, one = jnp.zeros_like(cth), jnp.ones_like(cth)
    Gsk = jnp.stack(
        [
            jnp.stack([-cth, -sth, -sth * dx + cth * dy]),
            jnp.stack([sth, -cth, -dx * cth - dy * sth]),
            jnp.stack([zero, zero, -one]),
        ]
    ).astype(dtype)
    Gmi = jnp.stack(
        [
            jnp.stack([cth, sth, zero]),
            jnp.stack([-sth, cth, zero]),
            jnp.stack([zero, zero, one]),
        ]
    ).astype(dtype)

    sigma_s = sigma[:3, :3]
    inner = Gsk @ sigma_s @ Gsk.T + Rk.astype(dtype)
    # The reference transposes `inner` (:241) — symmetric, so a no-op kept
    # for fidelity of intent.
    sigma_mm = Gmi @ inner.T @ Gmi.T
    sigma_mx = -(Gmi @ Gsk) @ sigma[:3, :]  # [3, N]

    # sigma_mx's columns at the new slot are zero (slot inactive), so the
    # row add and col add don't overlap; the [slot, slot] 3x3 comes only
    # from the sigma_mm term.
    sigma_new = sigma + E.T @ sigma_mx + sigma_mx.T @ E + E.T @ (sigma_mm @ E)
    return mu_new, sigma_new


def lookup_slots(slot_ids: Array, ids: Array) -> Array:
    """Map marker ids -> state slots (-1 if unknown) — the reference's
    ``checkLandmark`` / ``aruco_id_map`` (src/aruco_slam.cpp:423-435) as a
    vectorized comparison instead of a tree map."""
    hit = slot_ids[None, :] == ids[:, None]  # [M, max_lm]
    found = jnp.any(hit, axis=1)
    idx = jnp.argmax(hit, axis=1).astype(jnp.int32)
    return jnp.where(found, idx, -1)


def update(state: EkfState, frame: FrameObservations, config: SlamConfig) -> EkfState:
    """Process one image frame's observations sequentially.

    Ordering matches the reference's priority queue (smallest map index
    first, new markers (index -1) before all known ones — aruco_slam.h:85-88);
    ties between new markers break by arrival order (the reference's heap
    order for equal keys is unspecified).
    """
    max_lm = config.ekf.max_landmarks
    m_obs = frame.ids.shape[0]
    dtype = state.mu.dtype

    slots = lookup_slots(state.slot_ids, frame.ids)  # frame-start slots
    arrival = jnp.arange(m_obs, dtype=jnp.int32)
    big = jnp.asarray(2_000_000_000, jnp.int32)
    order_key = jnp.where(frame.valid, slots * m_obs + arrival, big)
    perm = jnp.argsort(order_key)

    sorted_obs = FrameObservations(
        ids=frame.ids[perm], z=frame.z[perm], R=frame.R[perm], valid=frame.valid[perm]
    )
    sorted_slots = slots[perm]

    mu0 = state.mu  # stale linearization point (src/aruco_slam.cpp:88)
    frozen_last_obs = state.last_obs
    frozen_seen = state.seen_prev

    lm_iota = jnp.arange(max_lm, dtype=jnp.int32)

    def step(carry, ob):
        mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped = carry
        ob_id, z, Rk, valid, slot = ob
        z = z.astype(dtype)
        is_known = slot >= 0
        has_room = n_lm < max_lm

        def do_known(_):
            sel = lm_iota == slot  # one-hot over slots (no gathers/scatters)
            m, s, nlo, div, _applied = _known_landmark_update(
                mu, sigma, mu0, slot, z, Rk,
                jnp.any(sel & frozen_seen),
                sel.astype(dtype) @ frozen_last_obs,
                config,
            )
            return (
                m, s, slot_ids, n_lm,
                jnp.where(sel[:, None], nlo[None, :], new_last),
                new_seen | sel,
                diverged + div.astype(jnp.int32),
                dropped,
            )

        def do_new(_):
            m, s = _new_landmark_insert(mu, sigma, mu0, n_lm, z, Rk)
            sel = lm_iota == n_lm
            return (
                m, s,
                jnp.where(sel, ob_id, slot_ids),
                n_lm + 1,
                # Reference pushes the new marker with last_observation_
                # uninitialized (defined here as zeros) — see quirk (c).
                jnp.where(sel[:, None], 0.0, new_last),
                new_seen | sel,
                diverged,
                dropped,
            )

        def do_drop(_):
            return (
                mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged,
                dropped + 1,
            )

        def process(_):
            return jax.lax.cond(
                is_known,
                do_known,
                lambda __: jax.lax.cond(has_room, do_new, do_drop, __),
                _,
            )

        def skip(_):
            return (mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped)

        return jax.lax.cond(valid, process, skip, None), None

    init = (
        state.mu,
        state.sigma,
        state.slot_ids,
        state.n_landmarks,
        state.last_obs,
        jnp.zeros_like(state.seen_prev),
        state.diverged,
        state.dropped,
    )
    xs = (sorted_obs.ids, sorted_obs.z, sorted_obs.R, sorted_obs.valid, sorted_slots)
    (mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped), _ = (
        jax.lax.scan(step, init, xs)
    )

    if config.ekf.symmetrize_sigma:
        sigma = 0.5 * (sigma + sigma.T)

    # Skip everything if no encoder tick arrived yet (addImage early-out,
    # src/aruco_slam.cpp:84-85).
    def keep_old():
        return state

    def use_new():
        return EkfState(
            mu=mu, sigma=sigma, slot_ids=slot_ids, n_landmarks=n_lm,
            last_obs=new_last, seen_prev=new_seen,
            initialized=state.initialized, diverged=diverged, dropped=dropped,
        )

    return jax.lax.cond(state.initialized, use_new, keep_old)


# ---------------------------------------------------------------------------
# Output accessors (reference toRosPose / toRosMappedMarkers,
# src/aruco_slam.cpp:378-410,265-281)
# ---------------------------------------------------------------------------


def get_pose(state: EkfState):
    """Robot pose (x, y, theta) and its 3x3 covariance."""
    return state.mu[:3], state.sigma[:3, :3]


def get_map(state: EkfState, config: SlamConfig):
    """Landmark states [max_lm, 3], ids [max_lm], active mask [max_lm]."""
    max_lm = config.ekf.max_landmarks
    lms = state.mu[3:].reshape(max_lm, 3)
    active = jnp.arange(max_lm) < state.n_landmarks
    return lms, state.slot_ids, active
