"""Pallas TPU kernel: the EKF frame step for a whole replay BATCH in one
kernel launch, with the batch on the LANE (minor) dimension.

Why: the XLA batched frame step costs ~75 us per observation at batch 64
— not in its matmuls (the [64, 3, 99] x [64, 99, 99] products measure
~free, benchmarks/batch_layout_probe.py) but in ~40 kernel launches per
observation x ~1-2 us launch overhead. This kernel replaces ~700 launches
per frame with ONE: every per-lane scalar is a [1, B] slab, the
covariance lives as [N, N, B] with lanes minor, and every contraction in
the update is over a dimension of size <= 3 — so the whole sequential
per-observation chain is elementwise/broadcast VPU work plus [N, N, B]
FMA passes, fully vectorized across the batch.

Semantics are identical to ``ekf.predict_block`` followed by
``ekf.update`` (stale linearization mean, sorted observation order
computed outside, stationary/divergence gates, landmark augmentation,
bookkeeping) — asserted against the XLA pair in
tests/test_pallas_kernels.py. The per-frame [3, 3] predict composition
(A, Q) and the pose mean integration run outside in XLA (a cheap
per-tick scan); the kernel applies the covariance transform and the
observation chain.

Layout notes: batch B should be a multiple of 128 lanes for full VPU
utilization (64 works at half). The state rides the replay scan in
trailing-batch layout; transpose once per replay, not per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aruco_slam_tpu.utils.config import SlamConfig

Array = jax.Array


def _wrap(a):
    two_pi = 2.0 * jnp.pi
    a = jnp.where(a >= jnp.pi, a - two_pi, a)
    return jnp.where(a < -jnp.pi, a + two_pi, a)


def _inv3(S):
    """Closed-form 3x3 inverse of a per-lane matrix given as a list of
    lists of [1, B] slabs."""
    a, b, c = S[0]
    d, e, f = S[1]
    g, h, i = S[2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    return [
        [co_a * inv_det, -(b * i - c * h) * inv_det, (b * f - c * e) * inv_det],
        [co_b * inv_det, (a * i - c * g) * inv_det, -(a * f - c * d) * inv_det],
        [co_c * inv_det, -(a * h - b * g) * inv_det, (a * e - b * d) * inv_det],
    ]


def _mat3_mul(X, Y):
    return [
        [sum(X[i][k] * Y[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def _mat3_T(X):
    return [[X[j][i] for j in range(3)] for i in range(3)]


def _frame_kernel(
    # state (trailing batch)
    mu_ref, sigma_ref, slot_ids_ref, n_lm_ref, last_obs_ref, seen_ref,
    div_ref, drop_ref,
    # predict inputs
    pose_ref, A_ref, Q_ref,
    # sorted observations
    ids_ref, z_ref, R_ref, valid_ref, slots_ref,
    # outputs
    mu_out, sigma_out, slot_ids_out, n_lm_out, last_obs_out, seen_out,
    div_out, drop_out,
    *, config: SlamConfig, m_obs: int, n_dim: int, batch: int,
):
    cfg = config
    max_lm = cfg.ekf.max_landmarks

    mu = mu_ref[:]  # [N, B]
    sigma = sigma_ref[:]  # [N, N, B]
    dtype = mu.dtype

    # ---------------- predict: sigma <- Hx sigma Hx^T + Q ----------------
    # A, Q already compose the frame's encoder ticks (and the first-tick
    # latch) — see ekf.predict_block.
    # (.at[...] on VALUES lowers to scatter, which Mosaic lacks — all
    # structural writes below are iota-mask where()s.)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n_dim, batch), 0)
    iota_r3 = jax.lax.broadcasted_iota(jnp.int32, (n_dim, 1, 1), 0)
    iota_c3 = jax.lax.broadcasted_iota(jnp.int32, (1, n_dim, 1), 1)

    A = [[A_ref[3 * i + j: 3 * i + j + 1] for j in range(3)] for i in range(3)]
    Q = [[Q_ref[3 * i + j: 3 * i + j + 1] for j in range(3)] for i in range(3)]
    rows = [sigma[k] for k in range(3)]  # [N, B] each
    new_rows = [
        sum(A[i][k] * rows[k] for k in range(3)) for i in range(3)
    ]
    for i in range(3):
        sigma = jnp.where(iota_r3 == i, new_rows[i][None, :, :], sigma)
    # columns: sigma[:, j] <- sum_k sigma[:, k] * A[j][k]; fold the process
    # noise Q (top-left 3x3 block) into the same write
    cols = [sigma[:, k] for k in range(3)]  # [N, B]
    for j in range(3):
        new_col = sum(cols[k] * A[j][k] for k in range(3))
        q_col = sum(
            jnp.where(iota_n == i, Q[i][j], 0.0) for i in range(3)
        )
        sigma = jnp.where(
            iota_c3 == j, (new_col + q_col)[:, None, :], sigma
        )
    for i in range(3):
        mu = jnp.where(iota_n == i, pose_ref[i: i + 1], mu)

    # Use the OUTPUT refs as the working store across the unrolled obs
    # loop: value-carried [N, N, B] state keeps every iteration's
    # temporaries live and overflows the 16 MB VMEM stack (measured
    # 20.9 MB at batch 64); storing per iteration bounds liveness to one
    # observation's working set.
    sigma_out[:] = sigma
    mu_out[:] = mu

    mu0 = mu  # stale linearization mean (src/aruco_slam.cpp:88)
    x0 = mu0[0:1]
    y0 = mu0[1:2]
    th0 = mu0[2:3]
    sth = jnp.sin(th0)
    cth = jnp.cos(th0)

    iota_lm = jax.lax.broadcasted_iota(jnp.int32, (max_lm, batch), 0)
    iota_mid3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3, 1), 1)

    frozen_last = last_obs_ref[:]  # [max_lm, 3, B]
    frozen_seen = seen_ref[:] != 0  # [max_lm, B]

    slot_ids = slot_ids_ref[:]
    n_lm = n_lm_ref[:]  # [1, B]
    new_last = frozen_last
    new_seen = jnp.zeros((max_lm, batch), jnp.int32)
    diverged = div_ref[:]
    dropped = drop_ref[:]

    for i in range(m_obs):
        mu = mu_out[:]
        sigma = sigma_out[:]
        slot = slots_ref[i: i + 1]  # [1, B] i32
        valid = valid_ref[i: i + 1] != 0
        ob_id = ids_ref[i: i + 1]
        z = [z_ref[i, a: a + 1].astype(dtype) for a in range(3)]
        Rk = [
            [R_ref[i, 3 * a + b: 3 * a + b + 1].astype(dtype) for b in range(3)]
            for a in range(3)
        ]
        is_known = slot >= 0
        has_room = n_lm < max_lm
        eff = jnp.where(is_known, slot, n_lm)
        idx = 3 + 3 * eff  # [1, B]
        oh = [
            (iota_n == (idx + r)).astype(dtype) for r in range(3)
        ]  # [N, B] one-hot rows of the landmark block
        sel = (iota_lm == eff)  # [max_lm, B]

        # ---------------- known-landmark branch --------------------------
        m_r = [jnp.sum(oh[r] * mu0, axis=0, keepdims=True) for r in range(3)]
        gdx = m_r[0] - x0
        gdy = m_r[1] - y0
        gdth = _wrap(m_r[2] - th0)
        zh0 = gdx * cth + gdy * sth
        zh1 = -gdx * sth + gdy * cth
        ze = [z[0] - zh0, z[1] - zh1, _wrap(z[2] - gdth)]
        zero = jnp.zeros_like(cth)
        one = jnp.ones_like(cth)
        Gp = [
            [-cth, -sth, -gdx * sth + gdy * cth],
            [sth, -cth, -gdx * cth - gdy * sth],
            [zero, zero, -one],
        ]
        Gl = [[cth, sth, zero], [-sth, cth, zero], [zero, zero, one]]

        sig_pose = [sigma[k] for k in range(3)]  # [N, B]
        sig_lm = [
            jnp.sum(oh[r][:, None, :] * sigma, axis=0) for r in range(3)
        ]  # [N, B]
        Bm = [
            sum(Gp[k][kk] * sig_pose[kk] for kk in range(3))
            + sum(Gl[k][kk] * sig_lm[kk] for kk in range(3))
            for k in range(3)
        ]  # [N, B] rows of B = Gx sigma

        # S = B[:, :3] Gp^T + (B E^T) Gl^T + R
        Bp = [[Bm[a][kk: kk + 1] for kk in range(3)] for a in range(3)]
        BE = [
            [
                jnp.sum(Bm[a] * oh[r], axis=0, keepdims=True)
                for r in range(3)
            ]
            for a in range(3)
        ]
        S = [
            [
                sum(Bp[a][kk] * Gp[b][kk] for kk in range(3))
                + sum(BE[a][r] * Gl[b][r] for r in range(3))
                + Rk[a][b]
                for b in range(3)
            ]
            for a in range(3)
        ]
        invS = _inv3(S)
        KT = [
            sum(invS[a][b] * Bm[b] for b in range(3)) for a in range(3)
        ]  # [N, B] rows of K^T (K = B^T S^-1)

        k_norm2 = sum(jnp.sum(KT[a] * KT[a], axis=0, keepdims=True)
                      for a in range(3))
        ze_norm2 = sum(ze[a] * ze[a] for a in range(3))
        div_hit = jnp.logical_or(
            ze_norm2 >= cfg.compat.divergence_ze_norm**2,
            k_norm2 >= cfg.compat.divergence_k_norm**2,
        )

        gate = jnp.zeros_like(valid)
        if cfg.compat.stationary_gate:
            seen_p = jnp.sum(
                jnp.where(sel & frozen_seen, 1, 0), axis=0, keepdims=True
            ) > 0
            last_p = [
                jnp.sum(
                    sel.astype(dtype) * frozen_last[:, a], axis=0,
                    keepdims=True,
                )
                for a in range(3)
            ]
            d2 = sum((last_p[a] - z[a]) ** 2 for a in range(3))
            gate = seen_p & (d2 < cfg.compat.stationary_gate_eps**2)
        reject = jnp.zeros_like(valid)
        if cfg.compat.reject_divergent:
            reject = div_hit

        do_known = valid & is_known
        do_new = valid & jnp.logical_not(is_known) & has_room
        do_drop = valid & jnp.logical_not(is_known) & jnp.logical_not(has_room)
        apply_known = (
            do_known & jnp.logical_not(gate) & jnp.logical_not(reject)
        )
        mk = apply_known.astype(dtype)  # [1, B]

        # ---------------- new-landmark branch ----------------------------
        mn = do_new.astype(dtype)
        map_x = x0 + cth * z[0] - sth * z[1]
        map_y = y0 + sth * z[0] + cth * z[1]
        map_th = _wrap(th0 + z[2])
        map_r = [map_x, map_y, map_th]
        # masked mean update (known + new branches), one store
        mu_out[:] = (
            mu
            + sum((mk * ze[a]) * KT[a] for a in range(3))
            + sum((mn * map_r[r]) * oh[r] for r in range(3))
        )
        dxn = map_x - x0
        dyn = map_y - y0
        Gsk = [
            [-cth, -sth, -sth * dxn + cth * dyn],
            [sth, -cth, -dxn * cth - dyn * sth],
            [zero, zero, -one],
        ]
        Gmi = [[cth, sth, zero], [-sth, cth, zero], [zero, zero, one]]
        sig3 = [[sigma[a: a + 1, b] for b in range(3)] for a in range(3)]
        inner = _mat3_mul(_mat3_mul(Gsk, sig3), _mat3_T(Gsk))
        for a in range(3):
            for b in range(3):
                inner[a][b] = inner[a][b] + Rk[a][b]
        smm = _mat3_mul(_mat3_mul(Gmi, _mat3_T(inner)), _mat3_T(Gmi))
        GmiGsk = _mat3_mul(Gmi, Gsk)
        smx = [
            -sum(GmiGsk[r][kk] * sig_pose[kk] for kk in range(3))
            for r in range(3)
        ]  # [N, B] rows of sigma_mx
        # sigma update (known rank-3 + new-landmark augmentation) as NINE
        # read-modify-write stores: one combined expression keeps ~9
        # [N, N, B] outer-product temporaries live simultaneously and
        # overflows the 16 MB VMEM stack (measured 22.4 MB at batch 64);
        # per-term stores bound the scoped allocation to one temp.
        # u_r = smx_r + 0.5 sum_r' smm[r, r'] oh_r' (smm symmetric).
        for a in range(3):
            sigma_out[:] = sigma_out[:] - (
                (mk * KT[a])[:, None, :] * Bm[a][None, :, :]
            )
        for r in range(3):
            u_r = smx[r] + 0.5 * sum(smm[r][rr] * oh[rr] for rr in range(3))
            sigma_out[:] = sigma_out[:] + (
                (mn * oh[r])[:, None, :] * u_r[None, :, :]
            )
            sigma_out[:] = sigma_out[:] + (
                (mn * u_r)[:, None, :] * oh[r][None, :, :]
            )

        # ---------------- bookkeeping ------------------------------------
        slot_ids = jnp.where(
            (do_new & sel), ob_id, slot_ids
        )
        n_lm = n_lm + do_new.astype(jnp.int32)
        processed = do_known | do_new
        write_mask = processed & sel  # [max_lm, B]
        # last_obs entry: known -> z (or zeros when the stationary gate
        # hit); new -> zeros (reference pushes it uninitialized)
        nlo = [
            jnp.where(do_known & jnp.logical_not(gate), z[a], 0.0)
            for a in range(3)
        ]
        for a in range(3):
            val = jnp.where(write_mask, nlo[a], new_last[:, a])
            new_last = jnp.where(
                iota_mid3 == a, val[:, None, :], new_last
            )
        new_seen = jnp.where(write_mask, 1, new_seen)
        diverged = diverged + (do_known & div_hit).astype(jnp.int32)
        dropped = dropped + do_drop.astype(jnp.int32)

    slot_ids_out[:] = slot_ids
    n_lm_out[:] = n_lm
    last_obs_out[:] = new_last
    seen_out[:] = new_seen
    div_out[:] = diverged
    drop_out[:] = dropped


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def frame_step_batched(
    state_t: dict,
    pose_new: Array,  # [3, B] predicted pose mean (latch-aware)
    A: Array,  # [9, B] composed pose Jacobian
    Q: Array,  # [9, B] composed process noise
    ids: Array,  # [M, B] SORTED observation ids
    z: Array,  # [M, 3, B]
    R9: Array,  # [M, 9, B]
    valid: Array,  # [M, B] int32
    slots: Array,  # [M, B] int32 frame-start slots, sorted with ids
    config: SlamConfig,
    interpret: bool = False,
) -> dict:
    """One EKF frame step (predict covariance + sequential observation
    updates) for all batch lanes in one kernel launch. ``state_t`` is the
    trailing-batch state dict; see ``ekf_batched.py`` for the replay
    driver that maintains it."""
    n_dim, batch = state_t["mu"].shape
    m_obs = ids.shape[0]
    max_lm = config.ekf.max_landmarks
    dtype = state_t["mu"].dtype

    out_shapes = dict(
        mu=jax.ShapeDtypeStruct((n_dim, batch), dtype),
        sigma=jax.ShapeDtypeStruct((n_dim, n_dim, batch), dtype),
        slot_ids=jax.ShapeDtypeStruct((max_lm, batch), jnp.int32),
        n_lm=jax.ShapeDtypeStruct((1, batch), jnp.int32),
        last_obs=jax.ShapeDtypeStruct((max_lm, 3, batch), dtype),
        seen=jax.ShapeDtypeStruct((max_lm, batch), jnp.int32),
        div=jax.ShapeDtypeStruct((1, batch), jnp.int32),
        drop=jax.ShapeDtypeStruct((1, batch), jnp.int32),
    )
    keys = list(out_shapes)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _frame_kernel, config=config, m_obs=m_obs, n_dim=n_dim,
            batch=batch,
        ),
        out_shape=tuple(out_shapes[k] for k in keys),
        in_specs=[vmem] * 16,
        out_specs=tuple(vmem for _ in keys),
        interpret=interpret,
    )(
        state_t["mu"], state_t["sigma"], state_t["slot_ids"],
        state_t["n_lm"], state_t["last_obs"], state_t["seen"],
        state_t["div"], state_t["drop"],
        pose_new, A, Q, ids, z, R9, valid, slots,
    )
    out = dict(zip(keys, outs))
    if config.ekf.symmetrize_sigma:
        out["sigma"] = 0.5 * (
            out["sigma"] + jnp.swapaxes(out["sigma"], 0, 1)
        )
    return out
