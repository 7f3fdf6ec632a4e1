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


def test_json_tiers_apply_information_weights_and_kernels():
    """The remaining JSON sub-config tiers of beam_slam_launch/config:
    optimization/*_information_weights.json (w -> cov = 1/w^2),
    frame_initializers/io.json, and the vo/ kernel configs must load from
    the pipeline YAML and land in the in-struct params."""
    import os

    from beam_slam_tpu.pipeline.config import LocalMapperConfig
    from beam_slam_tpu.vision.camera import PinholeRadtan

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = LocalMapperConfig.from_yaml(os.path.join(root, "lvio.yaml"))
    assert cfg.imu.info_weight == 1.0
    assert cfg.scan_registration.covariance_weight == 1.0 / (100.0 ** 2)
    assert cfg.vo.standalone_rel_cov == 1.0 / (10.0 ** 2)
    assert cfg.gravity_info_weight == 10.0
    assert cfg.frame_init_type == "ODOMETRY"
    tracker = cfg.build_tracker(PinholeRadtan(400.0, 400.0, 320.0, 240.0))
    assert tracker.fast_cfg.threshold == 20.0
    assert tracker.lk_cfg.window == 21
    assert tracker.lk_cfg.levels == 4
    assert tracker.lk_cfg.iterations == 30
    assert tracker.min_features == 150


def test_ceres_config_json_tier():
    """optimization/ceres_config.json -> SolverOptions + wall-clock budget
    + robust-loss scale (the reference's solver-internals JSON)."""
    import os

    from beam_slam_tpu.pipeline.config import LocalMapperConfig

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = LocalMapperConfig.from_dict(dict(
        mode="LIO", solver_config="optimization/ceres_config.json"))
    cfg.config_root = root
    cfg.apply_json_tiers()
    assert cfg.max_iterations == 10
    assert cfg.max_solver_time_s == 0.05
    assert cfg.function_tolerance == 1e-6
    sm_cfg = cfg.smoother_config()
    assert sm_cfg.max_solver_time_s == 0.05
    assert sm_cfg.solver.function_tolerance == 1e-6


def test_calibration_yaml_tier():
    """calibration_params.yaml + calibrations/<robot>/{cam.json,
    extrinsics.json} (4x4 row-major transforms, to_frame = baselink) load
    into CalibrationConfig."""
    import os

    import numpy as np

    from beam_slam_tpu.pipeline.config import CalibrationConfig

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = CalibrationConfig.from_yaml(
        os.path.join(root, "calibration_params.yaml"),
        calibrations_root=os.path.join(root, "calibrations"))
    assert cfg.imu_hz == 200 and cfg.camera_hz == 20 and cfg.lidar_hz == 10
    assert cfg.camera is not None
    assert cfg.camera.fx == 400.0 and cfg.camera.k1 == -0.05
    assert cfg.camera.width == 640
    # camera: transform is from_frame=cam -> to_frame=imu (T_imu_cam)
    np.testing.assert_allclose(cfg.p_baselink_cam, [0.10, 0.0, 0.05],
                               atol=1e-6)
    # quat of the z-forward camera rotation: R = [[0,0,1],[-1,0,0],[0,-1,0]]
    R_cam = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    from beam_slam_tpu.core import lie
    import jax.numpy as jnp
    q_ref = np.asarray(lie.matrix_to_quat(jnp.asarray(R_cam, jnp.float32)))
    assert (np.allclose(cfg.q_baselink_cam, q_ref, atol=1e-5)
            or np.allclose(cfg.q_baselink_cam, -q_ref, atol=1e-5))
    np.testing.assert_allclose(cfg.p_baselink_lidar, [0.05, 0.0, -0.08],
                               atol=1e-6)
    np.testing.assert_allclose(cfg.q_baselink_lidar, [1, 0, 0, 0],
                               atol=1e-6)
    # imu.json noise densities
    assert cfg.imu_intrinsics is not None
    assert cfg.imu_intrinsics.cov_gyro_noise == 0.0006
    assert cfg.imu_intrinsics.cov_accel_bias == 3.0e-6
