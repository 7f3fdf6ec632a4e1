"""Config system: the shipped reference-style YAMLs must load into working
LocalMapper configurations (SURVEY.md §5 'Config/flag system')."""

import numpy as np
import pytest

from beam_slam_tpu.pipeline.config import (CalibrationConfig,
                                           LocalMapperConfig)
from beam_slam_tpu.pipeline.local_mapper import LocalMapper
from beam_slam_tpu.vision.camera import PinholeRadtan


def test_lvio_yaml_loads():
    cfg = LocalMapperConfig.from_yaml("configs/lvio.yaml")
    assert cfg.mode == "LVIO"
    assert cfg.lag_duration == 10.0
    assert cfg.max_iterations == 10
    assert cfg.init.mode == "LIDAR"
    assert cfg.init.min_trajectory_length_m == 3.5
    assert cfg.imu.cov_gyro_noise == 1e-4
    assert cfg.vo.keyframe_parallax_px == 20.0
    assert cfg.registration_type == "SCANTOMAP"


def test_lio_yaml_builds_mapper():
    cfg = LocalMapperConfig.from_yaml("configs/lio.yaml")
    assert cfg.mode == "LIO" and cfg.max_iterations == 40
    mapper = LocalMapper(cfg)
    assert mapper.lo is not None and mapper.vo is None
    assert not mapper.initialized


def test_vio_yaml_builds_mapper():
    cfg = LocalMapperConfig.from_yaml("configs/vio.yaml")
    assert cfg.mode == "VIO" and cfg.lag_duration == 7.0
    assert cfg.init.mode == "VISUAL"
    cfg.calibration = CalibrationConfig(
        camera=PinholeRadtan(400, 400, 320, 240))
    mapper = LocalMapper(cfg)
    assert mapper.vo is not None and mapper.lo is None


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "weird.yaml"
    p.write_text("mode: LIO\nnot_a_real_key: 42\n")
    cfg = LocalMapperConfig.from_yaml(str(p))
    assert cfg.mode == "LIO"
