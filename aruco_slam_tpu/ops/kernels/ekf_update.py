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

Mosaic notes: everything in-kernel is strictly 2-D (rank-1 vectors crash
the layout engine); per-observation scalars travel in SMEM (dynamic lane
indexing of VMEM is illegal); 3x3 algebra is built from [1,1] scalars via
concatenate.

sigma for the default capacity (max_lm=64 -> N=195, padded internally by
Mosaic) is ~150 KB — far under the 16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aruco_slam_tpu.utils.config import SlamConfig

Array = jax.Array


def _s11(x):
    """Scalar -> [1, 1]."""
    return x[None, None]


def _row3(a, b, c):
    """Three scalars -> [1, 3]."""
    return jnp.concatenate([_s11(a), _s11(b), _s11(c)], axis=1)


def _mat3(r0, r1, r2):
    """Three [1, 3] rows -> [3, 3]."""
    return jnp.concatenate([r0, r1, r2], axis=0)


def _wrap_scalar(a):
    two_pi = 2.0 * jnp.pi
    a = jnp.where(a >= jnp.pi, a - two_pi, a)
    return jnp.where(a < -jnp.pi, a + two_pi, a)


def _inv3x3_2d(A):
    """Closed-form 3x3 inverse with strictly-2D intermediates."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    r0 = _row3(co_a, -(b * i - c * h), b * f - c * e)
    r1 = _row3(co_b, a * i - c * g, -(a * f - c * d))
    r2 = _row3(co_c, -(a * h - b * g), a * e - b * d)
    return _mat3(r0, r1, r2) * inv_det


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

    mu0 = mu_ref[:]  # [1, N] stale linearization mean (src/aruco_slam.cpp:88)
    sigma0 = sigma_ref[0]
    dtype = mu0.dtype

    iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, n_dim), 1)  # [1, N]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)  # [3, 1]
    lm_iota = jax.lax.broadcasted_iota(jnp.int32, (max_lm, 1), 0)  # [max_lm,1]

    x0 = mu0[0, 0]
    y0 = mu0[0, 1]
    th0 = mu0[0, 2]
    sth, cth = jnp.sin(th0), jnp.cos(th0)
    zero = jnp.zeros_like(cth)
    one = jnp.ones_like(cth)

    frozen_last = last_obs_ref[0]  # [max_lm, 3]
    frozen_seen = seen_prev_ref[0][:, None] != 0  # [max_lm, 1]

    def obs_step(i, carry):
        mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped = carry
        # per-observation scalars from SMEM
        ob_id = obs_ids_ref[0, i]
        z0 = obs_z_ref[0, i, 0]
        z1 = obs_z_ref[0, i, 1]
        z2 = obs_z_ref[0, i, 2]
        z_row = _row3(z0, z1, z2).astype(dtype)  # [1, 3]
        Rk = _mat3(
            _row3(obs_R_ref[0, i, 0, 0], obs_R_ref[0, i, 0, 1], obs_R_ref[0, i, 0, 2]),
            _row3(obs_R_ref[0, i, 1, 0], obs_R_ref[0, i, 1, 1], obs_R_ref[0, i, 1, 2]),
            _row3(obs_R_ref[0, i, 2, 0], obs_R_ref[0, i, 2, 1], obs_R_ref[0, i, 2, 2]),
        ).astype(dtype)
        valid = obs_valid_ref[0, i] != 0
        slot = obs_slot_ref[0, i]

        is_known = slot >= 0
        has_room = n_lm < max_lm
        eff_slot = jnp.where(is_known, slot, n_lm)
        idx = 3 + 3 * eff_slot
        E = (iota_row == (idx + iota3)).astype(dtype)  # [3, N]
        sel = lm_iota == eff_slot  # [max_lm, 1]

        # ---------------- known-landmark branch --------------------------
        m_col = E @ mu0.T  # [3, 1] stale landmark state
        gdx = m_col[0, 0] - x0
        gdy = m_col[1, 0] - y0
        gdth = _wrap_scalar(m_col[2, 0] - th0)
        zh0 = gdx * cth + gdy * sth
        zh1 = -gdx * sth + gdy * cth
        ze = _row3(z0 - zh0, z1 - zh1, _wrap_scalar(z2 - gdth)).astype(dtype)
        Gp = _mat3(
            _row3(-cth, -sth, -gdx * sth + gdy * cth),
            _row3(sth, -cth, -gdx * cth - gdy * sth),
            _row3(zero, zero, -one),
        ).astype(dtype)
        Gl = _mat3(
            _row3(cth, sth, zero),
            _row3(-sth, cth, zero),
            _row3(zero, zero, one),
        ).astype(dtype)
        B = Gp @ sigma[:3, :] + Gl @ (E @ sigma)  # [3, N]
        S = B[:, :3] @ Gp.T + (B @ E.T) @ Gl.T + Rk  # [3, 3]
        K = (_inv3x3_2d(S) @ B).T  # [N, 3]
        k_norm2 = jnp.sum(K * K)
        ze_norm2 = jnp.sum(ze * ze)
        div_hit = jnp.logical_or(
            ze_norm2 >= cfg.compat.divergence_ze_norm**2,
            k_norm2 >= cfg.compat.divergence_k_norm**2,
        )
        mu_upd = mu + (K @ ze.T).T  # [1, N]
        sigma_upd = sigma - K @ B

        gate = jnp.zeros((), bool)
        if cfg.compat.stationary_gate:
            seen_p = jnp.any(sel & frozen_seen)
            last_p = sel.astype(dtype).T @ frozen_last  # [1, 3]
            gate = jnp.logical_and(
                seen_p,
                jnp.sum((last_p - z_row) ** 2)
                < cfg.compat.stationary_gate_eps**2,
            )
        reject = jnp.zeros((), bool)
        if cfg.compat.reject_divergent:
            reject = div_hit
        skip = jnp.logical_or(gate, reject)
        mu_known = jnp.where(skip, mu, mu_upd)
        sigma_known = jnp.where(skip, sigma, sigma_upd)
        nlo_known = jnp.where(gate, jnp.zeros_like(z_row), z_row)

        # ---------------- new-landmark branch ----------------------------
        map_x = x0 + cth * z0 - sth * z1
        map_y = y0 + sth * z0 + cth * z1
        map_th = _wrap_scalar(th0 + z2)
        mu_new = mu + (E.T @ _row3(map_x, map_y, map_th).astype(dtype).T).T
        dxn = map_x - x0
        dyn = map_y - y0
        Gsk = _mat3(
            _row3(-cth, -sth, -sth * dxn + cth * dyn),
            _row3(sth, -cth, -dxn * cth - dyn * sth),
            _row3(zero, zero, -one),
        ).astype(dtype)
        Gmi = _mat3(
            _row3(cth, sth, zero),
            _row3(-sth, cth, zero),
            _row3(zero, zero, one),
        ).astype(dtype)
        inner = Gsk @ sigma[:3, :3] @ Gsk.T + Rk
        sigma_mm = Gmi @ inner.T @ Gmi.T
        sigma_mx = -(Gmi @ Gsk) @ sigma[:3, :]  # [3, N]
        sigma_new = (
            sigma + E.T @ sigma_mx + sigma_mx.T @ E + E.T @ (sigma_mm @ E)
        )

        # ---------------- select -----------------------------------------
        do_known = valid & is_known
        do_new = valid & jnp.logical_not(is_known) & has_room
        do_drop = valid & jnp.logical_not(is_known) & jnp.logical_not(has_room)
        processed = do_known | do_new

        mu = jnp.where(do_known, mu_known, jnp.where(do_new, mu_new, mu))
        sigma = jnp.where(
            do_known, sigma_known, jnp.where(do_new, sigma_new, sigma)
        )
        slot_ids = jnp.where(do_new & sel, ob_id, slot_ids)  # [max_lm, 1]
        n_lm = n_lm + do_new.astype(jnp.int32)
        nlo = jnp.where(do_known, nlo_known, jnp.zeros_like(z_row))  # [1, 3]
        write_mask = processed & sel  # [max_lm, 1]
        new_last = jnp.where(write_mask, nlo, new_last)  # [max_lm, 3]
        new_seen = new_seen | write_mask
        diverged = diverged + (do_known & div_hit).astype(jnp.int32)
        dropped = dropped + do_drop.astype(jnp.int32)
        return (mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped)

    carry = (
        mu0,
        sigma0,
        slot_ids_ref[0][:, None],  # [max_lm, 1]
        n_lm_ref[0, 0],
        frozen_last,
        jnp.zeros((max_lm, 1), bool),
        div_ref[0, 0],
        drop_ref[0, 0],
    )
    # Unrolled: scf.for with this mixed-layout carry fails Mosaic
    # legalization, and unrolling also makes every SMEM read static.
    for i in range(m_obs):
        carry = obs_step(i, carry)
    mu, sigma, slot_ids, n_lm, new_last, new_seen, diverged, dropped = carry

    if cfg.ekf.symmetrize_sigma:
        sigma = 0.5 * (sigma + sigma.T)

    # addImage early-out before the first encoder tick (src/aruco_slam.cpp:84)
    keep = init_ref[0, 0] != 0
    mu_out[:] = jnp.where(keep, mu, mu0)
    sigma_out[0] = jnp.where(keep, sigma, sigma0)
    slot_ids_out[0] = jnp.where(keep, slot_ids[:, 0], slot_ids_ref[0])
    n_lm_out[0, 0] = jnp.where(keep, n_lm, n_lm_ref[0, 0])
    last_obs_out[0] = jnp.where(keep, new_last, frozen_last)
    seen_out[0] = jnp.where(
        keep, new_seen[:, 0].astype(jnp.int32), seen_prev_ref[0]
    )
    div_out[0, 0] = jnp.where(keep, diverged, div_ref[0, 0])
    drop_out[0, 0] = jnp.where(keep, dropped, drop_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
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
        jax.ShapeDtypeStruct((1, max_lm), jnp.int32),  # seen (int mask)
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # diverged
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # dropped
    )

    kernel = functools.partial(_frame_update_kernel, config=config, m_obs=m_obs)
    in_specs = [lane, lane, lane, smem, lane, lane, smem, smem, smem,
                smem, smem, smem, smem, smem]
    out_specs = (lane, lane, lane, smem, lane, lane, smem, smem)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(
        state.mu[None],
        state.sigma[None],
        state.slot_ids[None],
        scalar2d(state.n_landmarks, jnp.int32),
        state.last_obs[None],
        state.seen_prev[None].astype(jnp.int32),
        scalar2d(state.initialized, jnp.int32),
        scalar2d(state.diverged, jnp.int32),
        scalar2d(state.dropped, jnp.int32),
        ids_s[None],
        z_s[None],
        R_s[None],
        valid_s[None].astype(jnp.int32),
        slots_s[None],
    )
    mu, sigma, slot_ids, n_lm, last_obs, seen, div, drop = outs
    return ekf_mod.EkfState(
        mu=mu[0],
        sigma=sigma[0],
        slot_ids=slot_ids[0],
        n_landmarks=n_lm[0, 0],
        last_obs=last_obs[0],
        seen_prev=seen[0] != 0,
        initialized=state.initialized,
        diverged=div[0, 0],
        dropped=drop[0, 0],
    )
