"""Distributed BA tests on a virtual 8-device CPU mesh (SURVEY.md section
4.3): sharded solve must match the single-device solve, and the compiled
program's collective count must stay at the designed level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu.models import ba, graph_builder
from aruco_slam_tpu.parallel import dist_ba, mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(8)


def test_sharded_matches_single_device(mesh8):
    problem, true_poses, true_lms = graph_builder.synthetic_ba_problem(
        n_keyframes=48, n_landmarks=40, obs_per_kf=5, seed=4
    )
    problem_j = jax.tree.map(jnp.asarray, problem)
    poses_1, lms_1, stats = jax.jit(
        lambda p: ba.solve(p, iters=5, cg_iters=60, damping=1e-4)
    )(problem_j)

    sharded, lm_perm = dist_ba.partition_problem(problem, 8)
    poses_8, lms_8, history = dist_ba.solve_dist(
        sharded, mesh8, iters=5, cg_iters=60, damping=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(poses_8), np.asarray(poses_1), atol=2e-3
    )
    # de-permute sharded landmarks back to global slot order
    lms_8_global = np.asarray(lms_8)[lm_perm]
    np.testing.assert_allclose(lms_8_global, np.asarray(lms_1), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(history), np.asarray(stats.cost_history), rtol=2e-2
    )


def test_sharded_converges_to_truth(mesh8):
    problem, true_poses, true_lms = graph_builder.synthetic_ba_problem(
        n_keyframes=96, n_landmarks=64, obs_per_kf=6, init_noise=0.2, seed=5
    )
    sharded, lm_perm = dist_ba.partition_problem(problem, 8)
    poses, lms, history = dist_ba.solve_dist(
        sharded, mesh8, iters=8, cg_iters=60, damping=1e-4
    )
    err = np.linalg.norm(np.asarray(poses)[:, :2] - true_poses[:, :2], axis=1)
    assert err.mean() < 0.03, err.mean()
    assert float(history[-1]) < 0.05 * float(history[0])


def test_non_divisible_landmark_count(mesh8):
    """L not divisible by the shard count: padding slots must not perturb
    the solution."""
    problem, true_poses, true_lms = graph_builder.synthetic_ba_problem(
        n_keyframes=24, n_landmarks=37, obs_per_kf=4, seed=6
    )
    problem_j = jax.tree.map(jnp.asarray, problem)
    poses_1, lms_1, _ = jax.jit(
        lambda p: ba.solve(p, iters=3, cg_iters=40, damping=1e-4)
    )(problem_j)
    sharded, lm_perm = dist_ba.partition_problem(problem, 8)
    poses_8, lms_8, hist = dist_ba.solve_dist(
        sharded, mesh8, iters=3, cg_iters=40, damping=1e-4
    )
    np.testing.assert_allclose(np.asarray(poses_8), np.asarray(poses_1), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(lms_8)[lm_perm], np.asarray(lms_1), atol=3e-3
    )
    assert np.isfinite(np.asarray(hist)).all()


def test_sharded_replay_matches_batched(mesh8):
    """DP-sharded replay over the mesh == plain vmapped replay."""
    import jax.numpy as jnp

    from aruco_slam_tpu import runner
    from aruco_slam_tpu.sim import synthetic
    from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=8, max_observations_per_frame=4))
    seqs = [
        synthetic.generate_sequence(
            synthetic.SimParams(duration=3.0, seed=s, max_obs=4)
        )
        for s in range(8)
    ]
    f, epf = seqs[0].num_frames, seqs[0].enc_per_frame
    stack = lambda n: np.stack([getattr(s, n) for s in seqs])
    data = runner.ReplayData(
        enc_w=jnp.asarray(stack("enc_w").reshape(8, f, epf, 2)),
        enc_dt=jnp.asarray(stack("enc_dt").reshape(8, f, epf)),
        obs_ids=jnp.asarray(stack("obs_ids")),
        obs_z=jnp.asarray(stack("obs_z")),
        obs_R=jnp.asarray(stack("obs_R")),
        obs_valid=jnp.asarray(stack("obs_valid")),
    )
    plain = runner.replay_batch(data, cfg)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = runner.replay_sharded(data, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.trajectory), np.asarray(plain.trajectory), atol=1e-6
    )
