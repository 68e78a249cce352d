"""Full image-level pipeline: rendered frames -> detection -> PnP -> EKF.
This is the complete reference call stack (ImageCallback -> detectMarkers ->
estimatePoseSingleMarkers -> EKF update, SURVEY.md section 3.3) end to end."""

import numpy as np
import pytest

from aruco_slam_tpu import runner
from aruco_slam_tpu.ops.camera import CameraIntrinsics
from aruco_slam_tpu.sim import synthetic
from aruco_slam_tpu.utils.config import EkfConfig, SlamConfig

CFG = SlamConfig(ekf=EkfConfig(max_landmarks=32, max_observations_per_frame=24))
CAM = CameraIntrinsics.create(600.0, 600.0, 320.0, 240.0)


@pytest.fixture(scope="module")
def image_seq():
    p = synthetic.SimParams(duration=8.0, seed=7, frames_per_sec=5.0)
    return synthetic.generate_sequence(p, level="images", camera=CAM)


def test_image_level_slam(image_seq):
    res = runner.evaluate_sequence(image_seq, CFG, camera=CAM, level="images")
    # With subpixel corner refinement the image-level run is near-exact on
    # clean renders (measured ~3 mm ATE).
    assert res["ate"] < 0.05, res
    assert res["n_landmarks"] >= 3, res
    assert res["map_rmse"] < 0.08, res


def test_image_level_close_to_corner_level(image_seq):
    res_img = runner.evaluate_sequence(image_seq, CFG, camera=CAM, level="images")
    res_cor = runner.evaluate_sequence(image_seq, CFG, camera=CAM, level="corners")
    # image-level ATE should be within a small factor of the ideal-corner ATE
    assert res_img["ate"] < max(3.0 * res_cor["ate"], 0.3), (res_img, res_cor)
