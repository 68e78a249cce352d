"""BASELINE.md config 2 in miniature: long perimeter tour of a 100-marker
arena with loop closure via marker re-observation, EKF online + pose-graph/BA
batch refinement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aruco_slam_tpu import runner
from aruco_slam_tpu.models import ba, graph_builder
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=128, max_observations_per_frame=16))


@pytest.fixture(scope="module")
def tour_seq():
    arena = synthetic.make_arena(n_markers=100, width=20.0, height=16.0)
    p = synthetic.SimParams(
        duration=210.0,
        profile="tour",
        tour_width=20.0,
        tour_height=16.0,
        tour_inset=1.6,
        encoder_noise=0.4,
        fov_deg=90.0,
        max_view_angle_deg=85.0,
        seed=11,
    )
    return synthetic.generate_sequence(p, marker_map=arena)


def test_tour_covers_most_markers(tour_seq):
    seen = np.unique(tour_seq.obs_ids[tour_seq.obs_valid])
    assert len(seen) >= 80, len(seen)


def test_ekf_loop_closure(tour_seq):
    res = runner.evaluate_sequence(tour_seq, CFG)
    assert res["n_landmarks"] >= 80, res
    assert res["dropped"] == 0
    # First-lap map accumulates odometry drift until loop closure (classic
    # EKF-SLAM); the filter must stay bounded where dead reckoning diverges.
    assert res["ate"] < 2.0, res
    assert res["map_rmse"] < 2.0, res
    assert res["ate_aligned"] < 1.0, res


def test_ba_refines_tour(tour_seq):
    """Filter -> smoother: BA initialized from the EKF output must tighten
    the map below the filter's final error."""
    from aruco_slam_tpu import pipeline

    out = pipeline.ekf_then_ba(tour_seq, CFG, keyframe_stride=4)
    stats = out["stats"]
    assert float(stats.final_cost) < float(stats.initial_cost)
    id_to_true = {
        int(i): tour_seq.true_landmarks[k]
        for k, i in enumerate(tour_seq.true_landmark_ids)
    }
    before, after = [], []
    lms = np.asarray(out["landmarks"])
    for slot, aid in enumerate(out["landmark_ids"]):
        t = id_to_true[int(aid)]
        before.append(
            np.linalg.norm(np.asarray(out["problem"].landmarks)[slot, :2] - t[:2])
        )
        after.append(np.linalg.norm(lms[slot, :2] - t[:2]))
    assert np.mean(after) <= np.mean(before) * 1.05, (np.mean(before), np.mean(after))
    assert np.mean(after) < 0.6, np.mean(after)


def test_pose_graph_refines_tour(tour_seq):
    """The pose-graph leg (marker re-observations as relative-pose
    closures, landmark-free solve, landmarks recomposed from optimized
    poses — the formulation BASELINE config 2 names) must also tighten the
    map below the EKF init on the loop tour."""
    from aruco_slam_tpu import pipeline

    out = pipeline.ekf_then_pose_graph(tour_seq, CFG, keyframe_stride=4)
    assert out["n_closures"] > 100
    id_to_true = {
        int(i): tour_seq.true_landmarks[k]
        for k, i in enumerate(tour_seq.true_landmark_ids)
    }
    errs = []
    lms = np.asarray(out["landmarks"])
    for slot, aid in enumerate(out["landmark_ids"]):
        t = id_to_true[int(aid)]
        errs.append(np.linalg.norm(lms[slot, :2] - t[:2]))
    # EKF map_rmse on this tour is ~1 m at the final state; the pose-graph
    # refinement must land well below that
    assert np.mean(errs) < 0.6, np.mean(errs)
