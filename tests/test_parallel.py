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


def _compiled_hlo(mesh, sharded, iters, cg_iters):
    """Optimized HLO text of the distributed solve at the given trip counts."""
    from jax.sharding import PartitionSpec as P

    fn = lambda s: dist_ba.solve_dist(
        s, mesh, iters=iters, cg_iters=cg_iters, damping=1e-4
    )
    # solve_dist jits internally; lower the same shard_map program here so we
    # can inspect the compiled module.
    return (
        jax.jit(fn)
        .lower(sharded)
        .compile()
        .as_text()
    )


def _collective_lines(hlo: str):
    kinds = (
        "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
        "all-to-all",
    )
    out = {k: [] for k in kinds}
    for line in hlo.splitlines():
        s = line.strip()
        # instruction lines look like "%name = type op(...)"; fusion wrappers
        # like all-reduce-start/done count as their base op
        for k in kinds:
            if f" {k}(" in s or f" {k}-start(" in s:
                out[k].append(s)
    return out


def test_collective_count_matches_design(mesh8):
    """The compiled distributed-BA program's collective set must stay at the
    designed level (SURVEY.md section 4.3: 'measure collective counts rather
    than wall time in CI'):

    - psum (all-reduce) only — no all-gather / reduce-scatter /
      collective-permute / all-to-all anywhere;
    - a small constant number of all-reduce instructions (design: 1 inside
      the CG loop body, Hpp/bp/bs once per GN step, cost scalars — XLA's
      combiner may merge some, so assert a bound, not equality);
    - the instruction count is CONSTANT in both trip counts: collectives
      live in loop bodies, so per-iteration traffic is exactly the designed
      one-[K,3]-psum per CG iteration, not something that scales with
      cg_iters.
    """
    problem, _, _ = graph_builder.synthetic_ba_problem(
        n_keyframes=24, n_landmarks=16, obs_per_kf=4, seed=7
    )
    sharded, _ = dist_ba.partition_problem(problem, 8)

    hlo_small = _compiled_hlo(mesh8, sharded, iters=2, cg_iters=8)
    coll_small = _collective_lines(hlo_small)
    for kind in ("all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        assert not coll_small[kind], f"unexpected {kind}: {coll_small[kind][:2]}"
    n_small = len(coll_small["all-reduce"])
    assert 1 <= n_small <= 4, (
        f"designed <=4 all-reduce instructions (1 CG-body psum + ONE fused "
        f"GN-step linearization psum + cost scalars), got {n_small}"
    )

    hlo_big = _compiled_hlo(mesh8, sharded, iters=5, cg_iters=64)
    n_big = len(_collective_lines(hlo_big)["all-reduce"])
    assert n_big == n_small, (
        f"all-reduce count must not scale with trip counts "
        f"(got {n_small} at 2x8 vs {n_big} at 5x64)"
    )


def test_detect_frames_sharded_matches_unsharded(mesh8):
    """detect_frames is sharding-transparent: a dp-sharded image stack
    must produce the same detections as the plain host-chunked path —
    the multi-chip dryrun routes through the same function (VERDICT r3
    weak 5)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aruco_slam_tpu import runner
    from aruco_slam_tpu.ops.camera import CameraIntrinsics
    from aruco_slam_tpu.sim import synthetic

    cam = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
    seqs = [
        synthetic.generate_sequence(
            synthetic.SimParams(duration=0.6, seed=s, frames_per_sec=5.0,
                                max_obs=8),
            level="images", camera=cam,
        )
        for s in range(2)
    ]
    data = runner.build_batch_data(seqs, 8, "images")
    plain = runner.detect_frames(data.images, chunk=4)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    imgs_sharded = jax.device_put(
        data.images, NamedSharding(mesh, P("dp"))
    )
    with mesh:
        sharded = runner.detect_frames(imgs_sharded)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(np.any(np.asarray(plain[2])))  # scene has detections


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
