"""Tests for the config system and map.txt parser edge cases
(semantics at reference src/map_loader.cpp:18-79, SURVEY.md section 4.1)."""

import numpy as np
import pytest

from aruco_slam_tpu.io import map_io
from aruco_slam_tpu.utils import config as cfg

REFERENCE_MAP = """# id    length\tx\ty\tz\troll_x\tpitch_y\tyaw_z
0   0.27\t5.10375 0       0.3     0    -1.5708   0
1\t0.27\t5.10375 -1.5    0.3     0    -1.5708   0
2\t0.27\t5.10375 -3 \t0.3 \t0    -1.5708   0
3\t0.27\t4   0.6025 0.3 \t1.5708 \t-0\t0
4\t0.27\t2 \t0.6025 0.3 \t1.5708 \t-0\t0
5\t0.27\t4 \t-4.09375 0.3 \t-1.5708\t-0\t0
6\t0.27\t2 \t-4.09375 0.3 \t-1.5708 -0\t0
"""


def test_reference_map_parses():
    m = map_io.parse_map_lines(REFERENCE_MAP.splitlines(True))
    assert len(m) == 7
    assert list(m.ids) == [0, 1, 2, 3, 4, 5, 6]
    np.testing.assert_allclose(m.lengths, 0.27)
    np.testing.assert_allclose(m.positions[0], [5.10375, 0, 0.3])
    np.testing.assert_allclose(m.rpys[0], [0, -1.5708, 0])
    np.testing.assert_allclose(m.rpys[3], [1.5708, 0, 0])


def test_blank_and_comment_lines_skipped():
    m = map_io.parse_map_lines(["\n", "  \n", "# comment\n", "1 0.2 3 4\n"])
    assert len(m) == 1


def test_garbage_line_clears_whole_map():
    """Non-digit-leading line discards everything (src/map_loader.cpp:44-50)."""
    m = map_io.parse_map_lines(["1 0.2 3 4\n", "x bad line\n", "2 0.2 3 4\n"])
    assert len(m) == 0
    # A leading minus counts as garbage too (isdigit check)
    m = map_io.parse_map_lines(["-1 0.2 3 4\n"])
    assert len(m) == 0


def test_short_line_skipped():
    m = map_io.parse_map_lines(["1 0.2 3\n", "2 0.2 3 4\n"])
    assert list(m.ids) == [2]


def test_optional_field_cascade():
    """Sticky-failure cascade (src/map_loader.cpp:60-79)."""
    # 4 fields: all optionals 0
    m = map_io.parse_map_lines(["7 0.2 1 2\n"])
    np.testing.assert_allclose(m.positions[0], [1, 2, 0])
    np.testing.assert_allclose(m.rpys[0], 0)
    # 5 fields: z kept
    m = map_io.parse_map_lines(["7 0.2 1 2 0.5\n"])
    np.testing.assert_allclose(m.positions[0], [1, 2, 0.5])
    # 6 fields: parsed roll is LOST (overwritten by failing yaw branch)
    m = map_io.parse_map_lines(["7 0.2 1 2 0.5 0.9\n"])
    np.testing.assert_allclose(m.rpys[0], [0, 0, 0])
    # 7 fields: pitch survives, roll lost, yaw undefined->0
    m = map_io.parse_map_lines(["7 0.2 1 2 0.5 0.9 0.8\n"])
    np.testing.assert_allclose(m.rpys[0], [0, 0.8, 0])
    # 8 fields: everything kept
    m = map_io.parse_map_lines(["7 0.2 1 2 0.5 0.9 0.8 0.7\n"])
    np.testing.assert_allclose(m.rpys[0], [0.9, 0.8, 0.7])


def test_map_roundtrip(tmp_path):
    m = map_io.parse_map_lines(REFERENCE_MAP.splitlines(True))
    p = tmp_path / "out.txt"
    map_io.save_map(str(p), m)
    m2 = map_io.load_map(str(p))
    np.testing.assert_allclose(m2.positions, m.positions, atol=1e-9)
    np.testing.assert_allclose(m2.rpys, m.rpys, atol=1e-9)
    assert list(m2.ids) == list(m.ids)


def test_planar_projection():
    m = map_io.parse_map_lines(["3 0.27 4 0.6 0.3 0 0 1.25\n"])
    np.testing.assert_allclose(m.planar()[0], [4, 0.6, 1.25])


# --- config ---------------------------------------------------------------


def test_default_config_matches_reference_effective_values():
    c = cfg.SlamConfig()
    assert c.covariance.Q_k == 0.01
    assert c.covariance.R_x == 100.0
    assert c.odom.kl == 0.05
    assert c.odom.b == 0.09
    assert c.aruco.markers_dictionary == 16
    assert c.aruco.marker_length == 0.27
    # Effective threshold is 3.0 due to the reference's key typo
    assert c.useful_distance_threshold == 3.0


def test_load_reference_parameters_yaml(tmp_path):
    ref_yaml = """
covariance:
    Q_k: 0.01
    R_x: 100
    R_y: 100
    R_theta: 10
odom:
    kl: 0.05
    kr: 0.05
    b: 0.09
aruco:
    markers_dictionary: 16
    marker_length: 0.27
frame:
    world_frame: "world"
    camera_frame_optical: "camera_frame_optical"
    robot_frame_base: "base_link"
topic:
    image: /camera/image_raw
    encoder: /encoder
const:
    USEFUL_DISTANCE_THRESHOLD: 4
"""
    p = tmp_path / "parameters.yaml"
    p.write_text(ref_yaml)
    c = cfg.load_config(str(p))
    assert c.covariance.R_theta == 10.0
    # When loaded through OUR loader the key is honored (bug made impossible)
    assert c.useful_distance_threshold == 4.0


def test_unknown_key_is_hard_error():
    with pytest.raises(cfg.ConfigError, match="unknown key"):
        cfg.load_config({"covariance": {"Q_k": 0.01, "Qk_typo": 1.0}})
    with pytest.raises(cfg.ConfigError, match="unknown key"):
        cfg.load_config({"covarianse": {}})
