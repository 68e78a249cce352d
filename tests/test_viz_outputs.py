"""Output-surface parity tests: 6x6 covariance packing, marker records,
annotated image, offline plots, and the reference-arena config-1 run."""

import numpy as np
import pytest

from aruco_slam_tpu import runner, viz
from aruco_slam_tpu.io import map_io
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=16, max_observations_per_frame=8))


@pytest.fixture(scope="module")
def run():
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=8.0, seed=13, max_obs=8)
    )
    data = runner.replay_data_from_sequence(seq)
    return seq, runner.replay(data, CFG)


def test_pose_covariance_packing(run):
    _, result = run
    rec = viz.pose_with_covariance(result.final_state)
    sigma = np.asarray(result.final_state.sigma)
    cov = rec["covariance6x6"]
    # reference packing indices (src/aruco_slam.cpp:399-407)
    assert cov[0] == sigma[0, 0]
    assert cov[7] == sigma[1, 1]
    assert cov[35] == sigma[2, 2]
    assert cov[5] == sigma[0, 2] and cov[30] == sigma[2, 0]
    # everything else zero
    nz = {0, 1, 5, 6, 7, 11, 30, 31, 35}
    for i in range(36):
        if i not in nz:
            assert cov[i] == 0.0
    assert rec["position"][2] == 0.1  # reference publishes z=0.1


def test_mapped_marker_records(run):
    _, result = run
    recs = viz.mapped_markers(result.final_state, CFG)
    assert len(recs) == int(result.final_state.n_landmarks)
    for r in recs:
        assert r["type"] == "CUBE"
        assert r["color_rgba"] == (1.0, 0.5, 1.0, 0.5)
        assert r["position"][2] == 0.3
        assert r["rpy"][1] == 1.5708


def test_draw_detections_marks_pixels():
    from aruco_slam_tpu.ops.detector import Detections
    import jax.numpy as jnp

    img = np.full((100, 100), 50, np.uint8)
    det = Detections(
        ids=jnp.asarray([7, -1]),
        corners=jnp.asarray(
            [[[10, 10], [40, 12], [38, 42], [9, 40]],
             [[0, 0], [0, 0], [0, 0], [0, 0]]], jnp.float32
        ),
        valid=jnp.asarray([True, False]),
    )
    out = viz.draw_detections(img, det)
    assert (out == 255).sum() > 50
    assert np.array_equal(img, np.full((100, 100), 50, np.uint8))  # copy
    # id label pixels: drawDetectedMarkers writes the id next to the
    # outline (reference src/aruco_slam.cpp:319) — the "7" glyph sits
    # right of the quad's max-x (40), clear of the outline/cross strokes
    label_region = out[:, 43:]
    assert (label_region == 255).sum() >= 7, (label_region == 255).sum()


def test_draw_detections_id_label_digits():
    """Multi-digit ids stamp one glyph per digit."""
    from aruco_slam_tpu.ops.detector import Detections
    import jax.numpy as jnp

    img = np.zeros((120, 160), np.uint8)
    det = Detections(
        ids=jnp.asarray([321]),
        corners=jnp.asarray(
            [[[20, 30], [60, 30], [60, 70], [20, 70]]], jnp.float32
        ),
        valid=jnp.asarray([True]),
    )
    out = viz.draw_detections(img, det)
    label = out[:, 62:]
    # three 3x5 glyphs at scale 2: "3"+"2"+"1" = (10+11+8) lit cells x 4 px
    assert (label == 255).sum() >= 100, (label == 255).sum()


def test_plot_run(tmp_path, run):
    seq, result = run
    path = str(tmp_path / "run.png")
    ok = viz.plot_run(result, seq, path)
    if ok:
        import os

        assert os.path.getsize(path) > 1000


def test_reference_arena_config1():
    """BASELINE.md config 1: EKF-SLAM against the reference's own 7-marker
    world definition (map/reference_arena.txt, same values as the reference
    ground-truth map)."""
    arena = map_io.load_map("map/reference_arena.txt")
    assert len(arena) == 7
    p = synthetic.SimParams(duration=30.0, seed=2)
    seq = synthetic.generate_sequence(p, marker_map=arena)
    cfg = SlamConfig(ekf=EkfConfig(max_landmarks=16, max_observations_per_frame=8))
    res = runner.evaluate_sequence(seq, cfg)
    assert res["n_landmarks"] >= 4, res
    assert res["ate"] < 0.2, res
    assert res["map_rmse"] < 0.2, res
