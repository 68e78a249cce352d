"""End-to-end slice (SURVEY.md section 7.3): synthetic arena -> encoder +
marker observations -> jitted PnP/EKF replay -> ATE vs generating map.
This is BASELINE.md config 1 in miniature."""

import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu import runner
from aruco_slam_tpu.io.sequence import stack_sequences
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=16))
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)


def short_params(**kw):
    kw.setdefault("seed", 3)
    return synthetic.SimParams(duration=20.0, **kw)


def test_obs_level_slam_converges():
    p = short_params()
    seq = synthetic.generate_sequence(p)
    res = runner.evaluate_sequence(seq, CFG)
    # Odometry-only drift over this trajectory is much larger; SLAM should
    # stay well-localized and map most visible markers.
    assert res["ate"] < 0.15, res
    assert res["map_rmse"] < 0.15, res
    assert res["n_landmarks"] >= 5
    assert res["dropped"] == 0


def test_slam_beats_dead_reckoning():
    p = short_params()
    seq = synthetic.generate_sequence(p)
    res = runner.evaluate_sequence(seq, CFG)
    # Dead reckoning: zero out all observations
    seq_dr = synthetic.generate_sequence(p)
    seq_dr.obs_valid[:] = False
    # With encoder noise the filter drifts; without noise dead reckoning is
    # exact — so add encoder noise to both.
    p2 = short_params(encoder_noise=1.5)
    seq_n = synthetic.generate_sequence(p2)
    seq_dr = synthetic.generate_sequence(p2)
    seq_dr.obs_valid[:] = False
    res_slam = runner.evaluate_sequence(seq_n, CFG)
    res_dr = runner.evaluate_sequence(seq_dr, CFG)
    assert res_slam["ate"] < res_dr["ate"]


def test_corner_level_slam_converges():
    p = short_params()
    arena = synthetic.make_arena(n_markers=20)
    seq = synthetic.generate_sequence(p, marker_map=arena, level="corners", camera=CAM)
    res = runner.evaluate_sequence(seq, CFG, camera=CAM, level="corners")
    assert res["ate"] < 0.25, res
    assert res["n_landmarks"] >= 5


def test_batched_replay_matches_single():
    seqs = [
        synthetic.generate_sequence(short_params(seed=s)) for s in (1, 2)
    ]
    batch = stack_sequences(seqs)
    f, epf = seqs[0].num_frames, seqs[0].enc_per_frame
    data = runner.ReplayData(
        enc_w=jnp.asarray(batch.enc_w.reshape(2, f, epf, 2)),
        enc_dt=jnp.asarray(batch.enc_dt.reshape(2, f, epf)),
        obs_ids=jnp.asarray(batch.obs_ids),
        obs_z=jnp.asarray(batch.obs_z),
        obs_R=jnp.asarray(batch.obs_R),
        obs_valid=jnp.asarray(batch.obs_valid),
    )
    out = runner.replay_batch(data, CFG)
    for i, s in enumerate(seqs):
        single = runner.replay(runner.replay_data_from_sequence(s), CFG)
        np.testing.assert_allclose(
            np.asarray(out.trajectory[i]), np.asarray(single.trajectory), atol=1e-5
        )


def test_sequence_save_load_roundtrip(tmp_path):
    seq = synthetic.generate_sequence(short_params())
    path = str(tmp_path / "seq.npz")
    seq.save(path)
    from aruco_slam_tpu.io.sequence import Sequence

    seq2 = Sequence.load(path)
    np.testing.assert_allclose(seq2.obs_z, seq.obs_z)
    assert seq2.enc_per_frame == seq.enc_per_frame
    res = runner.evaluate_sequence(seq2, CFG)
    assert res["ate"] < 0.15
