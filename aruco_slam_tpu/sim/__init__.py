"""Synthetic data generation — replaces the reference's external Gazebo sim
(launch/slam.launch:12-41, not part of the reference repo)."""
