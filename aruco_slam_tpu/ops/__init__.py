"""Compute-path ops: geometry, camera model, PnP, ArUco detection."""

from aruco_slam_tpu.ops import geometry
from aruco_slam_tpu.ops import camera
from aruco_slam_tpu.ops import pnp
