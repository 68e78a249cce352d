"""EKF core tests: parity with the dense float64 oracle, Jacobian checks
against autodiff, masking invariants (SURVEY.md section 4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.ops import geometry
from aruco_slam_tpu.utils.config import CompatConfig, EkfConfig, SlamConfig

from reference_ekf import ReferenceEKF

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=12, max_observations_per_frame=6))


def make_obs(ids, zs, Rs, m=6):
    """Pad observations to the static frame width."""
    k = len(ids)
    ids_a = np.full(m, -1, np.int32)
    z_a = np.zeros((m, 3), np.float32)
    R_a = np.tile(np.eye(3, dtype=np.float32), (m, 1, 1))
    valid = np.zeros(m, bool)
    ids_a[:k] = ids
    if k:
        z_a[:k] = zs
        R_a[:k] = Rs
    valid[:k] = True
    return ekf.FrameObservations(
        ids=jnp.asarray(ids_a), z=jnp.asarray(z_a), R=jnp.asarray(R_a),
        valid=jnp.asarray(valid),
    )


def random_covariance(rng):
    d = rng.uniform(0.01, 0.3, size=3)
    return np.diag(d).astype(np.float32)


def run_both(seq, cfg=CFG, oracle_kwargs=None):
    """Run (our EKF, oracle) over a mixed control/frame sequence."""
    state = ekf.init_state(cfg)
    oracle = ReferenceEKF(**(oracle_kwargs or {}))
    predict = jax.jit(ekf.predict, static_argnums=2)
    update = jax.jit(ekf.update, static_argnums=2)
    for kind, payload in seq:
        if kind == "enc":
            wl, wr, dt = payload
            state = predict(
                state,
                ekf.Control(jnp.float32(wl), jnp.float32(wr), jnp.float32(dt)),
                cfg,
            )
            oracle.add_encoder(wl, wr, dt)
        else:
            state = update(state, make_obs(*payload), cfg)
            ids, zs, Rs = payload
            oracle.add_frame(list(zip(ids, zs, Rs)))
    return state, oracle


def compare(state, oracle, cfg=CFG, atol=2e-3):
    n = 3 + 3 * len(oracle.id_map)
    mu = np.asarray(state.mu)
    sig = np.asarray(state.sigma)
    assert int(state.n_landmarks) == len(oracle.id_map)
    np.testing.assert_allclose(mu[:n], oracle.mu, atol=atol)
    np.testing.assert_allclose(sig[:n, :n], oracle.sigma, atol=atol)
    # Masked region must stay exactly zero
    assert np.all(mu[n:] == 0)
    assert np.all(sig[n:, :] == 0)
    assert np.all(sig[:, n:] == 0)


def random_sequence(rng, n_steps=40, n_markers=8, gate_hits=False):
    seq = [("enc", (0.0, 0.0, 0.1))]  # latch
    prev_z = {}
    for t in range(n_steps):
        wl = float(rng.uniform(0.5, 3.0))
        wr = float(rng.uniform(0.5, 3.0))
        seq.append(("enc", (wl, wr, 0.05)))
        if t % 2 == 0:
            k = int(rng.integers(1, 4))
            ids = list(rng.choice(n_markers, size=k, replace=False))
            zs, Rs = [], []
            for aid in ids:
                if gate_hits and aid in prev_z and rng.uniform() < 0.5:
                    z = prev_z[aid] + rng.normal(scale=0.001, size=3)
                else:
                    z = np.array(
                        [rng.uniform(0.3, 2.0), rng.uniform(-1, 1), rng.uniform(-0.5, 0.5)]
                    )
                prev_z[aid] = z
                zs.append(np.asarray(z, np.float32))
                Rs.append(random_covariance(rng))
            seq.append(("img", (ids, zs, Rs)))
    return seq


def test_predict_matches_oracle(rng):
    seq = [("enc", (0.0, 0.0, 0.1))] + [
        ("enc", (float(rng.uniform(-2, 4)), float(rng.uniform(-2, 4)), 0.05))
        for _ in range(50)
    ]
    state, oracle = run_both(seq)
    compare(state, oracle, atol=1e-4)


def test_first_encoder_is_latch_only():
    state = ekf.init_state(CFG)
    state = jax.jit(ekf.predict, static_argnums=2)(
        state, ekf.Control(jnp.float32(5.0), jnp.float32(5.0), jnp.float32(1.0)), CFG
    )
    np.testing.assert_allclose(np.asarray(state.mu[:3]), 0.0)
    np.testing.assert_allclose(np.asarray(state.sigma), 0.0)
    assert bool(state.initialized)


def test_image_before_encoder_is_ignored(rng):
    state = ekf.init_state(CFG)
    frame = make_obs([3], [np.array([1.0, 0.2, 0.1], np.float32)], [random_covariance(rng)])
    state2 = jax.jit(ekf.update, static_argnums=2)(state, frame, CFG)
    assert int(state2.n_landmarks) == 0
    np.testing.assert_allclose(np.asarray(state2.mu), 0.0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_full_slam_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    seq = random_sequence(rng)
    state, oracle = run_both(seq)
    compare(state, oracle)


def test_stationary_gate_matches_oracle(rng):
    seq = random_sequence(rng, gate_hits=True)
    state, oracle = run_both(seq)
    compare(state, oracle)


def test_gate_disabled(rng):
    cfg = SlamConfig(
        ekf=EkfConfig(max_landmarks=12, max_observations_per_frame=6),
        compat=CompatConfig(stationary_gate=False),
    )
    seq = random_sequence(rng, gate_hits=True)
    state, oracle = run_both(seq, cfg=cfg, oracle_kwargs={"stationary_gate": False})
    compare(state, oracle)


def test_new_markers_processed_before_known(rng):
    """A frame with one known and one new marker must process the new one
    first (index -1 sorts first), matching the oracle's ordering."""
    r = random_covariance(rng)
    seq = [
        ("enc", (0.0, 0.0, 0.1)),
        ("enc", (1.0, 1.2, 0.05)),
        ("img", ([5], [np.array([1.0, 0.0, 0.0], np.float32)], [r])),
        ("enc", (1.0, 1.2, 0.05)),
        # arrival order: known id 5 first, new id 7 second — processing
        # order must be 7 then 5.
        ("img", (
            [5, 7],
            [np.array([1.0, 0.1, 0.0], np.float32), np.array([0.5, -0.4, 0.2], np.float32)],
            [r, r],
        )),
    ]
    state, oracle = run_both(seq)
    compare(state, oracle)
    assert oracle.id_map == {5: 0, 7: 1}
    slot_ids = np.asarray(state.slot_ids)
    assert slot_ids[0] == 5 and slot_ids[1] == 7


def test_capacity_overflow_drops(rng):
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=2, max_observations_per_frame=6))
    state = ekf.init_state(cfg)
    update = jax.jit(ekf.update, static_argnums=2)
    predict = jax.jit(ekf.predict, static_argnums=2)
    state = predict(state, ekf.Control(jnp.float32(0), jnp.float32(0), jnp.float32(0.1)), cfg)
    r = random_covariance(rng)
    z = np.array([1.0, 0.0, 0.0], np.float32)
    frame = make_obs([1, 2, 3], [z, z, z], [r, r, r])
    state = update(state, frame, cfg)
    assert int(state.n_landmarks) == 2
    assert int(state.dropped) == 1


def test_observation_jacobian_matches_autodiff(rng):
    """The closed-form Gxm (src/aruco_slam.cpp:140-143) is the analytic
    d(z_hat)/d(pose, landmark); verify against jax.jacfwd."""
    pose = jnp.asarray(rng.uniform(-1, 1, size=3), jnp.float32)
    lm = jnp.asarray(rng.uniform(-1, 1, size=3), jnp.float32)

    def h(p, m):
        return geometry.se2_relative(p, m)

    Jp = jax.jacfwd(h, argnums=0)(pose, lm)
    Jl = jax.jacfwd(h, argnums=1)(pose, lm)
    x, y, th = pose
    mx, my, _ = lm
    st, ct = jnp.sin(th), jnp.cos(th)
    gdx, gdy = mx - x, my - y
    Gxm = np.array(
        [
            [-ct, -st, -gdx * st + gdy * ct, ct, st, 0],
            [st, -ct, -gdx * ct - gdy * st, -st, ct, 0],
            [0, 0, -1, 0, 0, 1],
        ]
    )
    np.testing.assert_allclose(np.asarray(Jp), Gxm[:, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(Jl), Gxm[:, 3:], atol=1e-5)


def test_motion_jacobian_matches_autodiff(rng):
    """H_xi (src/aruco_slam.cpp:55-58) == d(new pose)/d(old pose)."""
    kl = kr = 0.05
    b = 0.09
    wl, wr, dt = 2.0, 1.0, 0.05

    def motion(pose):
        dsl, dsr = kl * dt * wl, kr * dt * wr
        dth = (dsr - dsl) / (2 * b)
        ds = 0.5 * (dsr + dsl)
        tmp = pose[2] + 0.5 * dth
        return jnp.stack(
            [pose[0] + ds * jnp.cos(tmp), pose[1] + ds * jnp.sin(tmp), pose[2] + dth]
        )

    pose = jnp.asarray(rng.uniform(-1, 1, size=3), jnp.float32)
    J = jax.jacfwd(motion)(pose)
    dsl, dsr = kl * dt * wl, kr * dt * wr
    dth = (dsr - dsl) / (2 * b)
    ds = 0.5 * (dsr + dsl)
    tmp = float(pose[2]) + 0.5 * dth
    H = np.array(
        [[1, 0, -ds * np.sin(tmp)], [0, 1, ds * np.cos(tmp)], [0, 0, 1]]
    )
    np.testing.assert_allclose(np.asarray(J), H, atol=1e-5)


def test_update_is_vmappable(rng):
    cfg = CFG
    states = jax.tree.map(
        lambda x: jnp.stack([x, x]), ekf.init_state(cfg)
    )
    predict = jax.vmap(ekf.predict, in_axes=(0, 0, None))
    update = jax.vmap(ekf.update, in_axes=(0, 0, None))
    ctrl = ekf.Control(jnp.ones(2), jnp.ones(2), jnp.full(2, 0.05))
    states = predict(states, ctrl, cfg)
    states = predict(states, ctrl, cfg)
    r = random_covariance(rng)
    f = make_obs([4], [np.array([1, 0, 0], np.float32)], [r])
    frames = jax.tree.map(lambda x: jnp.stack([x, x]), f)
    states = jax.jit(update, static_argnums=2)(states, frames, cfg)
    assert int(states.n_landmarks[0]) == 1
    assert int(states.n_landmarks[1]) == 1


def test_predict_block_matches_sequential(rng):
    """Fused per-frame predict (predict_block) is bit-exact vs folding
    predict over the ticks, including the first-encoder latch."""
    cfg = CFG
    pred = jax.jit(ekf.predict, static_argnums=2)
    blk = jax.jit(ekf.predict_block, static_argnums=2)
    w = rng.uniform(0.5, 3.0, (10, 2)).astype(np.float32)
    for init in (False, True):
        state = ekf.init_state(cfg)
        if init:
            state = state._replace(initialized=jnp.ones((), bool))
            # seed some landmarks so sigma has off-pose structure
            r = random_covariance(rng)
            state = jax.jit(ekf.update, static_argnums=2)(
                state,
                make_obs([3, 5], [np.array([1.0, 0.2, 0.1], np.float32),
                                  np.array([0.5, -0.4, 0.0], np.float32)], [r, r]),
                cfg,
            )
        s_seq = state
        for k in range(10):
            s_seq = pred(
                s_seq,
                ekf.Control(jnp.float32(w[k, 0]), jnp.float32(w[k, 1]), jnp.float32(0.01)),
                cfg,
            )
        ctrl = ekf.Control(jnp.asarray(w[:, 0]), jnp.asarray(w[:, 1]),
                           jnp.full(10, 0.01, jnp.float32))
        s_blk = blk(state, ctrl, cfg)
        np.testing.assert_array_equal(np.asarray(s_seq.mu), np.asarray(s_blk.mu))
        np.testing.assert_array_equal(np.asarray(s_seq.sigma), np.asarray(s_blk.sigma))
