"""Interpret-mode equivalence check: frame_step_batched vs
ekf.predict_block + ekf.update over several frames with known/new/gated/
dropped observations."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops.kernels import ekf_update_batched as kb
from aruco_slam_tpu.utils.config import CompatConfig, EkfConfig, SlamConfig

B = 4
M = 6
EPF = 5
MAX_LM = 5  # small so capacity overflow is hit
CFG = SlamConfig(
    ekf=EkfConfig(max_landmarks=MAX_LM, max_observations_per_frame=M)
)
N = 3 + 3 * MAX_LM


def state_to_trailing(states):
    """list of EkfState (per lane) -> trailing dict."""
    stack = lambda f: np.stack([np.asarray(getattr(s, f)) for s in states])
    return dict(
        mu=jnp.asarray(np.moveaxis(stack("mu"), 0, -1)),
        sigma=jnp.asarray(np.moveaxis(stack("sigma"), 0, -1)),
        slot_ids=jnp.asarray(np.moveaxis(stack("slot_ids"), 0, -1)),
        n_lm=jnp.asarray(stack("n_landmarks")[None, :].astype(np.int32)),
        last_obs=jnp.asarray(np.moveaxis(stack("last_obs"), 0, -1)),
        seen=jnp.asarray(np.moveaxis(stack("seen_prev"), 0, -1).astype(np.int32)),
        div=jnp.asarray(stack("diverged")[None, :].astype(np.int32)),
        drop=jnp.asarray(stack("dropped")[None, :].astype(np.int32)),
    )


def compose_predict(state, controls):
    """Reuse ekf.predict_block's math to get (pose, A, Q) for one lane."""
    import jax.numpy as jnp

    odom, cov = CFG.odom, CFG.covariance
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def tick(carry, ctrl):
        pose, A, Q, initialized = carry
        wl, wr, dt = ctrl
        delta_sl = odom.kl * dt * wl
        delta_sr = odom.kr * dt * wr
        delta_theta = (delta_sr - delta_sl) / (2.0 * odom.b)
        delta_s = 0.5 * (delta_sr + delta_sl)
        tmp_th = pose[2] + 0.5 * delta_theta
        c, s = jnp.cos(tmp_th), jnp.sin(tmp_th)
        new_pose = jnp.stack([
            pose[0] + delta_s * c,
            pose[1] + delta_s * s,
            jnp.arctan2(jnp.sin(pose[2] + delta_theta), jnp.cos(pose[2] + delta_theta)),
        ])
        H = eye3.at[0, 2].set(-delta_s * s).at[1, 2].set(delta_s * c)
        wkh = (0.5 * odom.kl * dt) * jnp.stack([
            jnp.stack([c, c]), jnp.stack([s, s]),
            jnp.stack([1.0 / odom.b, -1.0 / odom.b]),
        ])
        sigma_u = jnp.diag(jnp.stack([cov.Q_k * jnp.abs(wl), cov.Q_k * jnp.abs(wr)]))
        Qk = wkh @ sigma_u @ wkh.T
        pose = jnp.where(initialized, new_pose, pose)
        A2 = jnp.where(initialized, H @ A, A)
        Q2 = jnp.where(initialized, H @ Q @ H.T + Qk, Q)
        return (pose, A2, Q2, jnp.ones((), bool)), None

    init = (state.mu[:3], eye3, jnp.zeros((3, 3), jnp.float32), state.initialized)
    (pose, A, Q, _), _ = jax.lax.scan(tick, init, controls)
    return pose, A, Q


def main():
    rng = np.random.default_rng(0)
    states = [ekf.init_state(CFG) for _ in range(B)]
    t_state = state_to_trailing(states)

    for frame in range(6):
        enc = (
            jnp.asarray(rng.uniform(0.5, 2.0, (B, EPF)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 2.0, (B, EPF)).astype(np.float32)),
            jnp.full((B, EPF), 0.01, jnp.float32),
        )
        ids = rng.integers(0, 8, size=(B, M)).astype(np.int32)
        z = rng.uniform(0.2, 2.0, size=(B, M, 3)).astype(np.float32)
        if frame == 3:
            # near-repeat of previous measurements to hit the stationary gate
            z = z_prev + rng.normal(scale=1e-4, size=z.shape).astype(np.float32)
            ids = ids_prev
        if frame == 4:
            # wild measurements to hit the divergence counter
            z = z * 10.0
        z_prev, ids_prev = z, ids
        R = np.tile(np.eye(3, dtype=np.float32) * 0.03, (B, M, 1, 1))
        valid = rng.random((B, M)) < 0.8

        # ---------- reference path per lane ----------
        new_states = []
        for l in range(B):
            st = states[l]
            st = ekf.predict_block(
                st, ekf.Control(enc[0][l], enc[1][l], enc[2][l]), CFG
            )
            fr = ekf.FrameObservations(
                ids=jnp.asarray(ids[l]), z=jnp.asarray(z[l]),
                R=jnp.asarray(R[l]), valid=jnp.asarray(valid[l]),
            )
            st = ekf.update(st, fr, CFG)
            new_states.append(st)
        states = new_states

        # ---------- kernel path ----------
        poses, As, Qs = [], [], []
        for l in range(B):
            # lane state BEFORE this frame, from the trailing dict
            mu_l = np.asarray(t_state["mu"])[:, l]
            init_l = frame > 0
            st_l = ekf.init_state(CFG)._replace(
                mu=jnp.asarray(mu_l),
                initialized=jnp.asarray(init_l),
            )
            p, A, Q = compose_predict(
                st_l, (enc[0][l], enc[1][l], enc[2][l])
            )
            poses.append(np.asarray(p))
            As.append(np.asarray(A).reshape(-1))
            Qs.append(np.asarray(Q).reshape(-1))
        pose_t = jnp.asarray(np.stack(poses, axis=-1))
        A_t = jnp.asarray(np.stack(As, axis=-1))
        Q_t = jnp.asarray(np.stack(Qs, axis=-1))

        # sort per lane exactly as ekf.update does
        slot_ids_lane = np.moveaxis(np.asarray(t_state["slot_ids"]), -1, 0)
        s_ids, s_z, s_R9, s_valid, s_slots = [], [], [], [], []
        for l in range(B):
            slots = np.asarray(
                ekf.lookup_slots(jnp.asarray(slot_ids_lane[l]), jnp.asarray(ids[l]))
            )
            arrival = np.arange(M)
            key = np.where(valid[l], slots * M + arrival, 2_000_000_000)
            perm = np.argsort(key, kind="stable")
            s_ids.append(ids[l][perm])
            s_z.append(z[l][perm])
            s_R9.append(R[l][perm].reshape(M, 9))
            s_valid.append(valid[l][perm])
            s_slots.append(slots[perm])
        ids_t = jnp.asarray(np.stack(s_ids, -1))
        z_t = jnp.asarray(np.stack(s_z, -1))
        R_t = jnp.asarray(np.stack(s_R9, -1))
        valid_t = jnp.asarray(np.stack(s_valid, -1).astype(np.int32))
        slots_t = jnp.asarray(np.stack(s_slots, -1))

        t_state = kb.frame_step_batched(
            t_state, pose_t, A_t, Q_t, ids_t, z_t, R_t, valid_t, slots_t,
            CFG, interpret=True,
        )

        # ---------- compare ----------
        ref_t = state_to_trailing(states)
        for k in ("mu", "sigma", "slot_ids", "n_lm", "last_obs", "seen",
                  "div", "drop"):
            a = np.asarray(t_state[k])
            b = np.asarray(ref_t[k])
            if not np.allclose(a, b, atol=2e-5, rtol=2e-5):
                bad = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
                print(f"frame {frame}: MISMATCH in {k}: max abs diff {bad}")
                sys.exit(1)
        print(f"frame {frame}: ok (n_lm={np.asarray(t_state['n_lm'])[0]}, "
              f"div={np.asarray(t_state['div'])[0]}, "
              f"drop={np.asarray(t_state['drop'])[0]})", flush=True)

    print("ALL FRAMES MATCH")


if __name__ == "__main__":
    main()
