"""Full LVIO pipeline end-to-end through the LocalMapper: LIDAR-mode SLAM
initialization → IMU + lidar + visual odometry fusion in the fixed-lag
smoother — the LVIO milestone (BASELINE.json config #4 / lvio.yaml
semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.models.visual_feature_tracker import CameraMeasurement
from beam_slam_tpu.models.lidar_odometry import SlamChunk
from beam_slam_tpu.pipeline.config import (CalibrationConfig,
                                           LocalMapperConfig)
from beam_slam_tpu.models.slam_initialization import InitParams
from beam_slam_tpu.pipeline.local_mapper import LocalMapper
from beam_slam_tpu.utils import sim
from beam_slam_tpu.vision.camera import PinholeRadtan

CAM = PinholeRadtan(400.0, 400.0, 320.0, 240.0)
Q_BC = np.asarray(lie.matrix_to_quat(jnp.asarray(
    [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], jnp.float32)))
P_BC = np.asarray([0.1, 0.0, 0.05], np.float32)
Q_BL = np.array([1, 0, 0, 0], np.float32)
P_BL = np.asarray([0.05, 0.0, -0.08], np.float32)

SCENE = synthetic_structured_scene(n_rings=16, width=504)


def scan_from_pose(q_wb, p_wb):
    """Scene observed from the lidar at T_WORLD_BASELINK·T_BASELINK_LIDAR."""
    q_wl = lie.quat_mul(jnp.asarray(q_wb), jnp.asarray(Q_BL))
    p_wl = jnp.asarray(p_wb) + lie.quat_rotate(jnp.asarray(q_wb),
                                               jnp.asarray(P_BL))
    xyz = lie.quat_rotate(lie.quat_conj(q_wl)[None, None], SCENE.xyz - p_wl)
    return SCENE._replace(xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0))


def camera_obs(q_wb, p_wb, lms, rng, noise_px=0.3):
    q_wc = lie.quat_mul(jnp.asarray(q_wb), jnp.asarray(Q_BC))
    p_wc = jnp.asarray(p_wb) + lie.quat_rotate(jnp.asarray(q_wb),
                                               jnp.asarray(P_BC))
    X_c = lie.quat_rotate(lie.quat_conj(q_wc)[None], jnp.asarray(lms) - p_wc)
    uv, valid = CAM.project(np.asarray(X_c))
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    ids = np.nonzero(valid)[0].astype(np.int64)
    pix = uv[valid] + rng.standard_normal((valid.sum(), 2)).astype(
        np.float32) * noise_px
    return ids, pix.astype(np.float32)


@pytest.mark.slow
def test_lvio_pipeline():
    rng = np.random.default_rng(11)
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.5, 0.2),
                                  v_drift=(0.35, 0.05, 0.0),
                                  amp_r=(0.1, 0.1, 0.15))
    n_lm = 100
    lms = np.stack([rng.uniform(4, 11, n_lm), rng.uniform(-4.5, 4.5, n_lm),
                    rng.uniform(-2.2, 2.2, n_lm)], axis=1).astype(np.float32)

    cfg = LocalMapperConfig(
        mode="LVIO", lag_duration=3.0, max_states=32, max_landmarks=256,
        max_reprojection_factors=4096, max_iterations=8,
        init=InitParams(mode="LIDAR", min_trajectory_length_m=1.5,
                        min_observability=0.1),
        calibration=CalibrationConfig(
            camera=CAM, q_baselink_cam=Q_BC, p_baselink_cam=P_BC,
            q_baselink_lidar=Q_BL, p_baselink_lidar=P_BL))
    chunks = []
    lm_mapper = LocalMapper(cfg, chunk_cb=chunks.append)

    imu_rate, cam_rate, lidar_rate, T = 200.0, 10.0, 5.0, 8.0
    dt_frame = 1.0 / cam_rate
    n_frames = int(T * cam_rate)
    errs = {}
    t_prev = 0.0
    for k in range(1, n_frames + 1):
        t = k * dt_frame
        n_imu = int(imu_rate / cam_rate)
        tm = t_prev + (np.arange(n_imu) + 0.5) / imu_rate
        s = traj.sample(jnp.asarray(tm, jnp.float32))
        for i in range(n_imu):
            lm_mapper.on_imu(float(tm[i]), np.asarray(s.w_body[i]),
                             np.asarray(s.a_body[i]))
        gk = traj.sample(jnp.asarray([t], jnp.float32))
        q_gt, p_gt = gk.q[0], gk.p[0]
        # lidar at its own (lower) rate
        if k % int(cam_rate / lidar_rate) == 0:
            lm_mapper.on_scan(round(t, 6), scan_from_pose(q_gt, p_gt))
        if lm_mapper.initialized:
            ids, pix = camera_obs(q_gt, p_gt, lms, rng)
            lm_mapper.on_camera_measurement(
                CameraMeasurement(round(t, 6), ids, pix, pix))
        lm_mapper.tick()
        if lm_mapper.initialized:
            stamps = lm_mapper.smoother.current_stamps()
            if stamps:
                st = lm_mapper.smoother.get_state(stamps[-1])
                errs[stamps[-1]] = st["p"].copy()
        t_prev = t

    assert lm_mapper.initialized, "SLAM initialization never fired"
    assert len(errs) > 10
    # The init world frame is anchored at the first lidar scan (and
    # gravity-yaw-aligned) — compute ATE after SE(3) alignment, the standard
    # SLAM evaluation (see utils/evaluation.py).
    from beam_slam_tpu.utils.evaluation import ate_rmse
    stamps_e = sorted(errs.keys())
    est = np.stack([errs[t] for t in stamps_e])
    gt_at = traj.sample(jnp.asarray(stamps_e, jnp.float32))
    rmse = ate_rmse(est, np.asarray(gt_at.p), align="se3")
    assert rmse < 0.06, rmse
    # visual map was built and lidar factors flowed
    assert lm_mapper.smoother.lm_active.sum() > 20
    assert lm_mapper.smoother.arena_rel.active.sum() > 3
    assert lm_mapper.smoother.arena_imu.active.sum() > 5
    # marginalization produced slam chunks once keyframes left the 5 s lag
    assert len(chunks) >= 1
    assert isinstance(chunks[0], SlamChunk)
