"""Equivalence of ekf.update_fused vs the sequential reference path.

The fused form is algebraically exact (same real-arithmetic result as the
sequential scan — see the update_fused docstring), so the two must agree to
f32 rounding on every state field, across known/new/invalid mixes, capacity
overflow, stationary gates, and divergence rejection.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.utils.config import CompatConfig, EkfConfig, SlamConfig


def random_state(rng, cfg, n_lm):
    max_lm = cfg.ekf.max_landmarks
    n = 3 + 3 * max_lm
    na = 3 + 3 * n_lm
    A = rng.normal(size=(na, na)) * 0.1
    sig_act = A @ A.T + 0.05 * np.eye(na)
    sigma = np.zeros((n, n), np.float32)
    sigma[:na, :na] = sig_act
    mu = np.zeros((n,), np.float32)
    mu[:na] = rng.normal(size=na)
    slot_ids = np.full((max_lm,), -1, np.int32)
    slot_ids[:n_lm] = rng.choice(1000, size=n_lm, replace=False)
    state = ekf.init_state(cfg)
    return state._replace(
        mu=jnp.asarray(mu),
        sigma=jnp.asarray(sigma),
        slot_ids=jnp.asarray(slot_ids),
        n_landmarks=jnp.asarray(n_lm, jnp.int32),
        last_obs=jnp.asarray(rng.normal(size=(max_lm, 3)).astype(np.float32)),
        seen_prev=jnp.asarray(rng.random(max_lm) < 0.5),
        initialized=jnp.ones((), bool),
    )


def random_frame(rng, cfg, state, n_known, n_new, n_invalid):
    m = cfg.ekf.max_observations_per_frame
    ids = np.full((m,), -1, np.int32)
    valid = np.zeros((m,), bool)
    n_lm = int(state.n_landmarks)
    known_ids = rng.choice(
        np.asarray(state.slot_ids[:n_lm]), size=min(n_known, n_lm), replace=False
    )
    new_ids = 2000 + rng.choice(1000, size=n_new, replace=False)
    use = list(known_ids) + list(new_ids)
    order = rng.permutation(m)
    for k, i in enumerate(use):
        ids[order[k]] = i
        valid[order[k]] = True
    # invalid slots keep garbage ids/z
    z = rng.normal(size=(m, 3)).astype(np.float32) * 0.5
    B = rng.normal(size=(m, 3, 3)).astype(np.float32) * 0.05
    R = B @ np.transpose(B, (0, 2, 1)) + 0.01 * np.eye(3, dtype=np.float32)
    return ekf.FrameObservations(
        ids=jnp.asarray(ids), z=jnp.asarray(z), R=jnp.asarray(R),
        valid=jnp.asarray(valid),
    )


def assert_states_close(s1, s2, atol):
    np.testing.assert_allclose(np.asarray(s1.mu), np.asarray(s2.mu), atol=atol)
    np.testing.assert_allclose(np.asarray(s1.sigma), np.asarray(s2.sigma), atol=atol)
    assert np.array_equal(np.asarray(s1.slot_ids), np.asarray(s2.slot_ids))
    assert int(s1.n_landmarks) == int(s2.n_landmarks)
    np.testing.assert_allclose(
        np.asarray(s1.last_obs), np.asarray(s2.last_obs), atol=atol
    )
    assert np.array_equal(np.asarray(s1.seen_prev), np.asarray(s2.seen_prev))
    assert int(s1.dropped) == int(s2.dropped)


@pytest.mark.parametrize("seed", range(6))
def test_fused_matches_sequential_mixed(seed):
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=12, max_observations_per_frame=8))
    rng = np.random.default_rng(seed)
    state = random_state(rng, cfg, n_lm=5)
    frame = random_frame(rng, cfg, state, n_known=3, n_new=2, n_invalid=3)
    s_seq = ekf.update(state, frame, cfg)
    s_fus = ekf.update_fused(state, frame, cfg)
    assert int(s_seq.diverged) == int(s_fus.diverged)
    assert_states_close(s_seq, s_fus, atol=5e-5)


def test_fused_capacity_overflow():
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=6, max_observations_per_frame=8))
    rng = np.random.default_rng(7)
    state = random_state(rng, cfg, n_lm=4)
    frame = random_frame(rng, cfg, state, n_known=2, n_new=5, n_invalid=1)
    s_seq = ekf.update(state, frame, cfg)
    s_fus = ekf.update_fused(state, frame, cfg)
    assert int(s_seq.dropped) == int(s_fus.dropped) > 0
    assert_states_close(s_seq, s_fus, atol=5e-5)


def test_fused_stationary_gate():
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=8, max_observations_per_frame=4))
    rng = np.random.default_rng(3)
    state = random_state(rng, cfg, n_lm=3)
    # Craft one observation identical to its last_obs with seen_prev set.
    sid = int(np.asarray(state.slot_ids)[1])
    state = state._replace(
        seen_prev=jnp.asarray(np.array([False, True, False] + [False] * 5)),
    )
    z1 = np.asarray(state.last_obs)[1]
    ids = np.array([sid, int(np.asarray(state.slot_ids)[0]), -1, -1], np.int32)
    z = np.stack([z1, rng.normal(size=3).astype(np.float32) * 0.3,
                  np.zeros(3, np.float32), np.zeros(3, np.float32)])
    R = np.broadcast_to(0.01 * np.eye(3, dtype=np.float32), (4, 3, 3)).copy()
    frame = ekf.FrameObservations(
        ids=jnp.asarray(ids), z=jnp.asarray(z), R=jnp.asarray(R),
        valid=jnp.asarray([True, True, False, False]),
    )
    s_seq = ekf.update(state, frame, cfg)
    s_fus = ekf.update_fused(state, frame, cfg)
    # the gated slot's last_obs must be zeroed in both paths
    assert np.allclose(np.asarray(s_seq.last_obs)[1], 0.0)
    assert_states_close(s_seq, s_fus, atol=5e-5)


@pytest.mark.parametrize("reject", [False, True])
def test_fused_divergence_modes(reject):
    cfg = SlamConfig(
        ekf=EkfConfig(max_landmarks=10, max_observations_per_frame=8),
        compat=CompatConfig(reject_divergent=reject, divergence_ze_norm=0.4),
    )
    rng = np.random.default_rng(11)
    state = random_state(rng, cfg, n_lm=6)
    frame = random_frame(rng, cfg, state, n_known=5, n_new=1, n_invalid=2)
    s_seq = ekf.update(state, frame, cfg)
    s_fus = ekf.update_fused(state, frame, cfg)
    assert int(s_seq.diverged) == int(s_fus.diverged)
    assert_states_close(s_seq, s_fus, atol=5e-5)


def test_fused_uninitialized_noop():
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=4, max_observations_per_frame=4))
    rng = np.random.default_rng(1)
    state = random_state(rng, cfg, n_lm=2)._replace(
        initialized=jnp.zeros((), bool)
    )
    frame = random_frame(rng, cfg, state, n_known=1, n_new=1, n_invalid=2)
    s_fus = ekf.update_fused(state, frame, cfg)
    assert np.array_equal(np.asarray(s_fus.mu), np.asarray(state.mu))
    assert int(s_fus.n_landmarks) == 2


def test_fused_multi_frame_replay_close():
    """Chained over many frames the two paths must stay numerically
    indistinguishable at trajectory level."""
    from aruco_slam_tpu import runner
    from aruco_slam_tpu.sim import synthetic

    cfg_seq = SlamConfig(ekf=EkfConfig(max_landmarks=24, max_observations_per_frame=8))
    seq = synthetic.generate_sequence(synthetic.SimParams(duration=20.0, seed=5))
    data = runner.replay_data_from_sequence(seq, "obs")

    r_seq = runner.replay(data, cfg_seq, None, "obs")
    cfg_fus = SlamConfig(
        ekf=EkfConfig(max_landmarks=24, max_observations_per_frame=8, fused_update=True)
    )
    r_fus = runner.replay(data, cfg_fus, None, "obs")
    traj_d = np.max(np.abs(np.asarray(r_seq.trajectory) - np.asarray(r_fus.trajectory)))
    assert traj_d < 1e-3, traj_d
    assert int(r_seq.final_state.n_landmarks) == int(r_fus.final_state.n_landmarks)


def test_frame_update_for_auto_rule(monkeypatch):
    """Pin the backend auto-selection boundary (VERDICT round 2): Pallas
    kernel at batch 1 on TPU, XLA scan under vmap, fused_update takes
    precedence over everything, explicit backends honored."""
    from aruco_slam_tpu import runner
    from aruco_slam_tpu.models import ekf

    def cfg(**kw):
        return SlamConfig(ekf=EkfConfig(max_landmarks=8, **kw))

    # fused_update wins regardless of backend/batched
    assert runner.frame_update_for(cfg(fused_update=True), False) is ekf.update_fused
    assert runner.frame_update_for(cfg(fused_update=True), True) is ekf.update_fused

    # auto on CPU -> XLA scan both ways
    monkeypatch.setattr(runner.jax, "default_backend", lambda: "cpu")
    assert runner.frame_update_for(cfg(), False) is ekf.update
    assert runner.frame_update_for(cfg(), True) is ekf.update

    # auto on TPU -> pallas at batch 1, XLA scan under vmap
    monkeypatch.setattr(runner.jax, "default_backend", lambda: "tpu")
    from aruco_slam_tpu.ops.kernels import ekf_update as kern

    assert runner.frame_update_for(cfg(), False) is kern.frame_update
    assert runner.frame_update_for(cfg(), True) is ekf.update

    # auto above the kernel's compile-capacity ceiling -> fused block-LDL
    # single-stream (the measured 2.2x winner at 512 landmarks,
    # docs/PERFORMANCE.md item 7; Mosaic crashes at 256+,
    # benchmarks/_ekf_kernel_capacity.py), XLA scan under vmap
    big = SlamConfig(ekf=EkfConfig(max_landmarks=256))
    assert runner.frame_update_for(big, False) is ekf.update_fused
    assert runner.frame_update_for(big, True) is ekf.update
    # boundary: exactly at the ceiling the kernel still compiles -> pallas
    edge = SlamConfig(
        ekf=EkfConfig(max_landmarks=runner._PALLAS_EKF_MAX_LANDMARKS)
    )
    assert runner.frame_update_for(edge, False) is kern.frame_update

    # explicit backend overrides the heuristic (even under vmap / on CPU)
    assert runner.frame_update_for(cfg(update_backend="pallas"), True) is kern.frame_update
    monkeypatch.setattr(runner.jax, "default_backend", lambda: "cpu")
    assert runner.frame_update_for(cfg(update_backend="pallas"), False) is kern.frame_update
    assert runner.frame_update_for(cfg(update_backend="xla"), False) is ekf.update

    # explicit pallas past the compile ceiling: a clear error, not an
    # opaque Mosaic tpu_compile_helper crash (ADVICE round 3 item 1)
    import pytest

    with pytest.raises(ValueError, match="ceiling"):
        runner.frame_update_for(
            SlamConfig(ekf=EkfConfig(max_landmarks=256, update_backend="pallas")),
            False,
        )
