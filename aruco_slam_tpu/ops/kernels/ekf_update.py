"""Pallas TPU kernel: the full EKF frame update with VMEM-resident state.

The XLA formulation of ``models.ekf.update`` dispatches ~40 ops per
observation, most touching the full [N, N] covariance — at batch B that is
~32 HBM passes over sigma per frame. This kernel keeps (mu, sigma,
bookkeeping) in VMEM for the *whole frame*: one HBM read and one write of
the state per frame regardless of the number of observations, with every
per-observation step (gain, rank-3 update, augmentation, gates) computed
on-chip. Sequential update semantics (sorted observation order, stale
linearization mean, reference quirks) are identical to ``models.ekf`` —
asserted exactly in tests (interpret mode on CPU, compiled on TPU).

Batching: grid over the batch dimension; each program owns one lane's
state block. sigma for the default capacity (max_lm=64 -> N=195 padded by
Mosaic) is ~150 KB — far under the 16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aruco_slam_tpu.ops import geometry
from aruco_slam_tpu.ops import linalg as small_linalg
from aruco_slam_tpu.utils.config import SlamConfig

Array = jax.Array


def _frame_update_kernel(
    # inputs (per-lane blocks)
    mu_ref, sigma_ref, slot_ids_ref, n_lm_ref, last_obs_ref, seen_prev_ref,
    init_ref, div_ref, drop_ref,
    obs_ids_ref, obs_z_ref, obs_R_ref, obs_valid_ref, obs_slot_ref,
    # outputs
    mu_out, sigma_out, slot_ids_out, n_lm_out, last_obs_out, seen_out,
    div_out, drop_out,
    *, config: SlamConfig, m_obs: int,
):
    cfg = config
    max_lm = cfg.ekf.max_landmarks
    n_dim = 3 + 3 * max_lm

    mu0 = mu_ref[0]  # [N] stale linearization mean (src/aruco_slam.cpp:88)
    mu = mu0
    sigma = sigma_ref[0]
    slot_ids = slot_ids_ref[0]
    n_lm = n_lm_ref[0, 0]
    frozen_last = last_obs_ref[0]
    frozen_seen = seen_prev_ref[0]
    initialized = init_ref[0, 0]
    diverged = div_ref[0, 0]
    dropped = drop_ref[0, 0]

    dtype = mu.dtype
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n_dim, 1), 0)[:, 0]
    lm_iota = jax.lax.broadcasted_iota(jnp.int32, (max_lm, 1), 0)[:, 0]

    new_last = frozen_last
    new_seen = jnp.zeros_like(frozen_seen)

    def obs_step(i, carry):
        mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped = carry
        ob_id = obs_ids_ref[0, i]
        z = obs_z_ref[0, i].astype(dtype)
        Rk = obs_R_ref[0, i].astype(dtype)
        valid = obs_valid_ref[0, i]
        slot = obs_slot_ref[0, i]

        is_known = slot >= 0
        has_room = n_lm < max_lm
        eff_slot = jnp.where(is_known, slot, n_lm)  # known: slot; new: n_lm
        idx = 3 + 3 * eff_slot
        E = (
            iota_n[None, :] == (idx + jnp.arange(3, dtype=jnp.int32))[:, None]
        ).astype(dtype)  # [3, N]
        sel = lm_iota == eff_slot  # [max_lm]

        # ---------------- known-landmark branch (computed always) --------
        x, y, th = mu0[0], mu0[1], mu0[2]
        m = E @ mu0
        sth, cth = jnp.sin(th), jnp.cos(th)
        gdx = m[0] - x
        gdy = m[1] - y
        gdth = geometry.wrap_angle(m[2] - th)
        z_hat = jnp.stack([gdx * cth + gdy * sth, -gdx * sth + gdy * cth, gdth])
        ze = z - z_hat
        ze = ze.at[2].set(geometry.wrap_angle(ze[2]))
        zero = jnp.zeros_like(cth)
        one = jnp.ones_like(cth)
        Gp = jnp.stack(
            [
                jnp.stack([-cth, -sth, -gdx * sth + gdy * cth]),
                jnp.stack([sth, -cth, -gdx * cth - gdy * sth]),
                jnp.stack([zero, zero, -one]),
            ]
        ).astype(dtype)
        Gl = jnp.stack(
            [
                jnp.stack([cth, sth, zero]),
                jnp.stack([-sth, cth, zero]),
                jnp.stack([zero, zero, one]),
            ]
        ).astype(dtype)
        B = Gp @ sigma[:3, :] + Gl @ (E @ sigma)  # [3, N]
        S = B[:, :3] @ Gp.T + (B @ E.T) @ Gl.T + Rk
        K = small_linalg.solve3x3(S, B).T  # [N, 3]
        k_norm = jnp.sqrt(jnp.sum(K * K))
        div_hit = jnp.logical_or(
            jnp.sqrt(jnp.sum(ze * ze)) >= cfg.compat.divergence_ze_norm,
            k_norm >= cfg.compat.divergence_k_norm,
        )
        mu_upd = mu + K @ ze
        sigma_upd = sigma - K @ B

        gate = jnp.zeros((), bool)
        if cfg.compat.stationary_gate:
            seen_p = jnp.any(sel & frozen_seen)
            last_p = sel.astype(dtype) @ frozen_last
            gate = jnp.logical_and(
                seen_p,
                jnp.sqrt(jnp.sum((last_p - z) ** 2)) < cfg.compat.stationary_gate_eps,
            )
        reject = jnp.zeros((), bool)
        if cfg.compat.reject_divergent:
            reject = div_hit
        skip = jnp.logical_or(gate, reject)
        mu_known = jnp.where(skip, mu, mu_upd)
        sigma_known = jnp.where(skip, sigma, sigma_upd)
        nlo_known = jnp.where(gate, jnp.zeros_like(z), z)

        # ---------------- new-landmark branch (computed always) ----------
        sthn, cthn = jnp.sin(mu0[2]), jnp.cos(mu0[2])
        map_x = mu0[0] + cthn * z[0] - sthn * z[1]
        map_y = mu0[1] + sthn * z[0] + cthn * z[1]
        map_th = geometry.wrap_angle(mu0[2] + z[2])
        mu_new = mu + E.T @ jnp.stack([map_x, map_y, map_th]).astype(dtype)
        dxn = map_x - mu0[0]
        dyn = map_y - mu0[1]
        Gsk = jnp.stack(
            [
                jnp.stack([-cthn, -sthn, -sthn * dxn + cthn * dyn]),
                jnp.stack([sthn, -cthn, -dxn * cthn - dyn * sthn]),
                jnp.stack([zero, zero, -one]),
            ]
        ).astype(dtype)
        Gmi = jnp.stack(
            [
                jnp.stack([cthn, sthn, zero]),
                jnp.stack([-sthn, cthn, zero]),
                jnp.stack([zero, zero, one]),
            ]
        ).astype(dtype)
        inner = Gsk @ sigma[:3, :3] @ Gsk.T + Rk
        sigma_mm = Gmi @ inner.T @ Gmi.T
        sigma_mx = -(Gmi @ Gsk) @ sigma[:3, :]
        sigma_new = sigma + E.T @ sigma_mx + sigma_mx.T @ E + E.T @ (sigma_mm @ E)

        # ---------------- select ----------------------------------------
        do_known = valid & is_known
        do_new = valid & jnp.logical_not(is_known) & has_room
        do_drop = valid & jnp.logical_not(is_known) & jnp.logical_not(has_room)
        processed = do_known | do_new

        mu = jnp.where(do_known, mu_known, jnp.where(do_new, mu_new, mu))
        sigma = jnp.where(
            do_known, sigma_known, jnp.where(do_new, sigma_new, sigma)
        )
        slot_ids = jnp.where(do_new & sel, ob_id, slot_ids)
        n_lm = n_lm + do_new.astype(jnp.int32)
        nlo = jnp.where(do_known, nlo_known, jnp.zeros_like(z))
        new_last = jnp.where(
            (processed & sel)[:, None], nlo[None, :], new_last
        )
        new_seen = new_seen | (processed & sel)
        diverged = diverged + (do_known & div_hit).astype(jnp.int32)
        dropped = dropped + do_drop.astype(jnp.int32)
        return (mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped)

    carry = (mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped)
    carry = jax.lax.fori_loop(0, m_obs, obs_step, carry)
    mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped = carry

    if cfg.ekf.symmetrize_sigma:
        sigma = 0.5 * (sigma + sigma.T)

    # addImage early-out before the first encoder tick (src/aruco_slam.cpp:84)
    keep = initialized
    mu_out[0] = jnp.where(keep, mu, mu0)
    sigma_out[0] = jnp.where(keep, sigma, sigma_ref[0])
    slot_ids_out[0] = jnp.where(keep, slot_ids, slot_ids_ref[0])
    n_lm_out[0, 0] = jnp.where(keep, n_lm, n_lm_ref[0, 0])
    last_obs_out[0] = jnp.where(keep, new_last, last_obs_ref[0])
    seen_out[0] = jnp.where(keep, new_seen, seen_prev_ref[0])
    div_out[0, 0] = jnp.where(keep, diverged, div_ref[0, 0])
    drop_out[0, 0] = jnp.where(keep, dropped, drop_ref[0, 0])


@functools.partial(
    jax.jit, static_argnames=("config", "interpret")
)
def frame_update(state, frame, config: SlamConfig, interpret: bool = False):
    """Drop-in replacement for ``models.ekf.update`` backed by the Pallas
    kernel. ``state``: EkfState; ``frame``: FrameObservations. Sorting and
    slot lookup run in XLA (tiny); the sequential update runs on-chip."""
    from aruco_slam_tpu.models import ekf as ekf_mod

    max_lm = config.ekf.max_landmarks
    m_obs = frame.ids.shape[0]
    slots = ekf_mod.lookup_slots(state.slot_ids, frame.ids)
    arrival = jnp.arange(m_obs, dtype=jnp.int32)
    big = jnp.asarray(2_000_000_000, jnp.int32)
    order_key = jnp.where(frame.valid, slots * m_obs + arrival, big)
    perm = jnp.argsort(order_key)
    ids_s = frame.ids[perm]
    z_s = frame.z[perm]
    R_s = frame.R[perm]
    valid_s = frame.valid[perm]
    slots_s = slots[perm]

    n_dim = 3 + 3 * max_lm
    dtype = state.mu.dtype

    def scalar2d(x, dt):
        return x.reshape(1, 1).astype(dt)

    lane = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((1, n_dim), dtype),  # mu
        jax.ShapeDtypeStruct((1, n_dim, n_dim), dtype),  # sigma
        jax.ShapeDtypeStruct((1, max_lm), jnp.int32),  # slot_ids
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # n_lm
        jax.ShapeDtypeStruct((1, max_lm, 3), dtype),  # last_obs
        jax.ShapeDtypeStruct((1, max_lm), jnp.bool_),  # seen
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # diverged
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # dropped
    )

    kernel = functools.partial(
        _frame_update_kernel, config=config, m_obs=m_obs
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[lane] * 14,
        out_specs=(lane,) * 8,
        interpret=interpret,
    )(
        state.mu[None],
        state.sigma[None],
        state.slot_ids[None],
        scalar2d(state.n_landmarks, jnp.int32),
        state.last_obs[None],
        state.seen_prev[None],
        scalar2d(state.initialized, jnp.bool_),
        scalar2d(state.diverged, jnp.int32),
        scalar2d(state.dropped, jnp.int32),
        ids_s[None],
        z_s[None],
        R_s[None],
        valid_s[None],
        slots_s[None],
    )
    mu, sigma, slot_ids, n_lm, last_obs, seen, div, drop = outs
    return ekf_mod.EkfState(
        mu=mu[0],
        sigma=sigma[0],
        slot_ids=slot_ids[0],
        n_landmarks=n_lm[0, 0],
        last_obs=last_obs[0],
        seen_prev=seen[0],
        initialized=state.initialized,
        diverged=div[0, 0],
        dropped=drop[0, 0],
    )
