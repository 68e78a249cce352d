"""Checkpointing, learned-map export, structured logging, CLI smoke tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu import cli, runner
from aruco_slam_tpu.io import checkpoint, map_io
from aruco_slam_tpu.models import ekf
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils import logging as slog
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=16, max_observations_per_frame=8))


def _run_short():
    seq = synthetic.generate_sequence(synthetic.SimParams(duration=6.0, seed=9, max_obs=8))
    data = runner.replay_data_from_sequence(seq)
    return seq, runner.replay(data, CFG)


def test_checkpoint_roundtrip_ekf_state(tmp_path):
    _, result = _run_short()
    state = result.final_state
    path = str(tmp_path / "ckpt")
    checkpoint.save_pytree(path, state)
    like = jax.tree.map(np.zeros_like, state)
    restored = checkpoint.load_pytree(path, like)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_from_checkpoint_continues_identically(tmp_path):
    """Save mid-run, restore, continue: must equal the uninterrupted run."""
    seq = synthetic.generate_sequence(synthetic.SimParams(duration=6.0, seed=9, max_obs=8))
    data = runner.replay_data_from_sequence(seq)
    full = runner.replay(data, CFG)

    half = jax.tree.map(lambda x: x[: seq.num_frames // 2], data)
    rest = jax.tree.map(lambda x: x[seq.num_frames // 2:], data)
    r1 = runner.replay(half, CFG)
    path = str(tmp_path / "mid")
    checkpoint.save_pytree(path, r1.final_state)
    restored = checkpoint.load_pytree(
        path, jax.tree.map(np.zeros_like, r1.final_state)
    )
    restored = jax.tree.map(jnp.asarray, restored)

    # continue: replay rest starting from restored state
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def replay_from(state0, d, cfg):
        def frame_step(state, xs):
            ew, edt, ids, z, R, valid = xs

            def enc_step(st, e):
                w, dt = e
                return ekf.predict(st, ekf.Control(w[0], w[1], dt), cfg), None

            state, _ = jax.lax.scan(enc_step, state, (ew, edt))
            state = ekf.update(
                state, ekf.FrameObservations(ids=ids, z=z, R=R, valid=valid), cfg
            )
            return state, state.mu[:3]

        return jax.lax.scan(
            frame_step, state0,
            (d.enc_w, d.enc_dt, d.obs_ids, d.obs_z, d.obs_R, d.obs_valid),
        )

    final, traj2 = replay_from(restored, rest, CFG)
    np.testing.assert_allclose(
        np.asarray(final.mu), np.asarray(full.final_state.mu), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj2[-1]), np.asarray(full.trajectory[-1]), atol=1e-5
    )


def test_export_learned_map_roundtrip(tmp_path):
    seq, result = _run_short()
    lms, ids, active = ekf.get_map(result.final_state, CFG)
    path = str(tmp_path / "learned_map.txt")
    checkpoint.export_learned_map(path, lms, ids, active)
    m = map_io.load_map(path)
    assert len(m) == int(result.final_state.n_landmarks)
    # round-trip through the face-normal convention recovers planar states
    planar = synthetic.map_to_planar(m)
    est = np.asarray(lms)[np.asarray(active)]
    est_ids = np.asarray(ids)[np.asarray(active)]
    order = {int(i): k for k, i in enumerate(m.ids)}
    for k, aid in enumerate(est_ids):
        row = planar[order[int(aid)]]
        np.testing.assert_allclose(row[:2], est[k, :2], atol=1e-5)
        assert abs(np.arctan2(np.sin(row[2] - est[k, 2]), np.cos(row[2] - est[k, 2]))) < 1e-4


def test_write_replay_log(tmp_path):
    _, result = _run_short()
    path = str(tmp_path / "run.jsonl")
    n = slog.write_replay_log(path, result)
    lines = [json.loads(l) for l in open(path)]
    assert n == len(lines) - 1
    assert lines[-1]["final"] is True
    assert {"frame", "x", "y", "theta", "cov_trace", "n_landmarks"} <= set(lines[0])


def test_cli_simulate_replay_ba(tmp_path):
    seq_path = str(tmp_path / "seq.npz")
    cli.main(
        ["simulate", "--out", seq_path, "--duration", "6", "--seed", "4"]
    )
    log_path = str(tmp_path / "log.jsonl")
    map_path = str(tmp_path / "map.txt")
    cli.main(
        [
            "replay", "--sequence", seq_path, "--log", log_path,
            "--export-map", map_path, "--max-landmarks", "16", "--max-obs", "16",
        ]
    )
    assert len(open(log_path).readlines()) > 2
    assert len(map_io.load_map(map_path)) > 0
    cli.main(["ba", "--sequence", seq_path, "--stride", "2", "--iters", "3"])


def test_cli_ba_ekf_init(tmp_path, capsys):
    """--ekf-init routes through the filter->smoother pipeline: the BA
    starts from the EKF solution, so its initial cost must be at or below
    the dead-reckoned initialization's on the same sequence."""
    import json

    seq_path = str(tmp_path / "seq.npz")
    cli.main(["simulate", "--out", seq_path, "--duration", "6", "--seed", "4"])
    capsys.readouterr()
    cli.main(["ba", "--sequence", seq_path, "--stride", "2", "--iters", "3",
              "--cg-iters", "40"])
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(["ba", "--sequence", seq_path, "--stride", "2", "--iters", "3",
              "--cg-iters", "40", "--ekf-init"])
    ekf_init = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ekf_init["keyframes"] == plain["keyframes"]
    assert ekf_init["initial_cost"] <= plain["initial_cost"] * 1.05


def test_sequence_meta_roundtrip(tmp_path):
    seq = synthetic.generate_sequence(synthetic.SimParams(duration=3.0, seed=1, max_obs=4))
    path = str(tmp_path / "m.npz")
    seq.save(path)
    from aruco_slam_tpu.io.sequence import Sequence

    s2 = Sequence.load(path)
    assert s2.meta.get("level") == "obs"
    assert tuple(s2.meta["start_pose"]) == tuple(seq.meta["start_pose"])
    np.testing.assert_allclose(
        s2.meta["true_pose_frames_world"], seq.meta["true_pose_frames_world"]
    )


def test_camera_travels_with_sequence(tmp_path, capsys):
    """Intrinsics are STREAM DATA (reference reads K/D from CameraInfo,
    src/aruco_slam_node.cpp:121-130): a sequence generated with a
    distorted, non-default camera must replay correctly via the CLI with
    NO hand-passed intrinsics — and visibly worse with the wrong ones."""
    seq_path = str(tmp_path / "seq.npz")
    cam_spec = "520,540,300,230,-0.25,0.08"  # nonzero k1/k2
    cli.main(
        ["simulate", "--out", seq_path, "--duration", "6", "--seed", "3",
         "--level", "corners", "--camera", cam_spec]
    )
    capsys.readouterr()

    # stored calibration round-trips through save/load
    from aruco_slam_tpu.io.sequence import Sequence

    s2 = Sequence.load(seq_path)
    cam = s2.camera()
    assert cam is not None
    np.testing.assert_allclose(float(cam.fx), 520.0)
    np.testing.assert_allclose(
        np.asarray(cam.dist), [-0.25, 0.08, 0.0, 0.0, 0.0]
    )

    # replay with no --camera: must pick up the stored calibration
    cli.main(["replay", "--sequence", seq_path, "--level", "corners",
              "--max-landmarks", "16", "--max-obs", "8"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ate"] < 0.1, res

    # the wrong camera (the old hardcoded default) must be visibly worse —
    # this is the correctness trap the stored calibration closes
    cli.main(["replay", "--sequence", seq_path, "--level", "corners",
              "--camera", "600,600,320,240",
              "--max-landmarks", "16", "--max-obs", "8"])
    res_wrong = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res_wrong["ate"] > 2.0 * res["ate"], (res, res_wrong)


def test_cli_config_not_clobbered(tmp_path):
    """--config ekf settings must survive unless CLI flags override them."""
    import argparse

    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("ekf:\n    max_landmarks: 128\n")
    args = argparse.Namespace(config=str(yaml_path), max_landmarks=None, max_obs=None)
    cfg = cli._load_config(args)
    assert cfg.ekf.max_landmarks == 128
    args = argparse.Namespace(config=str(yaml_path), max_landmarks=32, max_obs=None)
    cfg = cli._load_config(args)
    assert cfg.ekf.max_landmarks == 32
    assert cfg.ekf.max_observations_per_frame == 16  # untouched default


def test_profiler_trace_capture(tmp_path):
    """utils.logging.trace produces a TensorBoard-readable device trace."""
    import os

    from aruco_slam_tpu.utils import logging as slog

    logdir = str(tmp_path / "trace")
    with slog.trace(logdir):
        _run_short()
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert any(f.endswith(".trace.json.gz") or "trace" in f for f in found), found
