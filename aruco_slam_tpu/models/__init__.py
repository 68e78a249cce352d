"""Estimators: EKF-SLAM core, factor graph, pose-graph / bundle adjustment."""
