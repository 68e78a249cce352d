"""Online SlamSystem API tests: the reference ArucoSlam call-pattern
(interleaved addEncoder/addImage), full image path included."""

import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import renderer, synthetic
from aruco_slam_tpu.system import SlamSystem
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)
CFG = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=24))


def test_encoder_then_observations_tracks():
    seq = synthetic.generate_sequence(
        synthetic.SimParams(duration=10.0, seed=21, max_obs=8),
    )
    sys_ = SlamSystem(SlamConfig(ekf=EkfConfig(max_landmarks=16, max_observations_per_frame=8)))
    epf = seq.enc_per_frame
    enc_w = seq.enc_w.reshape(-1, epf, 2)
    enc_dt = seq.enc_dt.reshape(-1, epf)
    for f in range(seq.num_frames):
        for e in range(epf):
            sys_.add_encoder(enc_w[f, e, 0], enc_w[f, e, 1], enc_dt[f, e])
        sys_.add_observations(
            seq.obs_ids[f], seq.obs_z[f], seq.obs_R[f], seq.obs_valid[f]
        )
    err = np.linalg.norm(sys_.pose()[:2] - seq.true_pose_frames[-1, :2])
    assert err < 0.2, err
    lms, ids = sys_.landmark_map()
    assert len(lms) >= 3
    rec = sys_.pose_with_covariance()
    assert rec["covariance6x6"][0] >= 0


def test_image_path_live():
    arena = synthetic.make_arena(n_markers=20)
    stack = renderer.build_marker_stack(arena)
    sys_ = SlamSystem(CFG, camera=CAM)
    # two encoder ticks to initialize, then one rendered frame
    sys_.add_encoder(0.0, 0.0, 0.01)
    sys_.add_encoder(1.0, 1.0, 0.05)
    pose_world = (2.55, -2.0, 1.2)
    cam_pos, R_wc = renderer.camera_pose_from_robot(
        jnp.asarray(pose_world, jnp.float32)
    )
    img = renderer.render_frame(cam_pos, R_wc, stack, CAM)
    sys_.add_image(img)
    assert len(sys_.detected_markers()) >= 1
    marked = sys_.marked_image()
    assert marked is not None and (marked == 255).sum() > 20
    assert len(sys_.mapped_markers()) >= 1
    sys_.reset()
    assert len(sys_.mapped_markers()) == 0
