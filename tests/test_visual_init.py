"""VISUAL-mode SLAM initialization: SfM path (essential decomposition +
triangulation + PnP chain) + monocular scale from IMU alignment."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.models.slam_initialization import (InitParams,
                                                      SLAMInitialization)
from beam_slam_tpu.models.inertial_odometry import ImuParams
from beam_slam_tpu.models.visual_feature_tracker import CameraMeasurement
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import FixedLagSmoother, SmootherConfig
from beam_slam_tpu.utils import sim
from beam_slam_tpu.vision import sfm
from beam_slam_tpu.vision.camera import PinholeRadtan

CAM = PinholeRadtan(400.0, 400.0, 320.0, 240.0)
Q_BC = np.asarray(lie.matrix_to_quat(jnp.asarray(
    [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], jnp.float32)))
P_BC = np.asarray([0.1, 0.0, 0.05], np.float32)


def observe(q_wb, p_wb, lms):
    q_wc = lie.quat_mul(jnp.asarray(q_wb), jnp.asarray(Q_BC))
    p_wc = jnp.asarray(p_wb) + lie.quat_rotate(jnp.asarray(q_wb),
                                               jnp.asarray(P_BC))
    X_c = lie.quat_rotate(lie.quat_conj(q_wc)[None], jnp.asarray(lms) - p_wc)
    uv, valid = CAM.project(np.asarray(X_c))
    ids = np.nonzero(np.asarray(valid))[0].astype(np.int64)
    return ids, np.asarray(uv)[np.asarray(valid)].astype(np.float32)


def test_sfm_path_recovers_shape(rng):
    """compute_path_with_vision must reproduce the GT trajectory shape up to
    similarity (scale-free monocular)."""
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.6, 0.25),
                                  v_drift=(0.35, 0, 0))
    n_lm = 120
    lms = np.stack([rng.uniform(4, 12, n_lm), rng.uniform(-5, 5, n_lm),
                    rng.uniform(-3, 3, n_lm)], axis=1).astype(np.float32)
    stamps = [round(0.3 * k, 6) for k in range(8)]
    gt = traj.sample(jnp.asarray(stamps, jnp.float32))
    tracks = {}
    for i, t in enumerate(stamps):
        ids, uvs = observe(gt.q[i], gt.p[i], lms)
        for lm_id, uv in zip(ids, uvs):
            tracks.setdefault(int(lm_id), []).append((t, uv))
    path = sfm.compute_path_with_vision(CAM, tracks, stamps)
    assert path is not None
    # compare camera positions up to sim(3) alignment
    from beam_slam_tpu.utils.evaluation import ate_rmse
    est = np.stack([p for _, _, p in path])
    q_wc_gt, p_wc_gt = [], []
    for i in range(len(stamps)):
        q = lie.quat_mul(gt.q[i], jnp.asarray(Q_BC))
        p = gt.p[i] + lie.quat_rotate(gt.q[i], jnp.asarray(P_BC))
        p_wc_gt.append(np.asarray(p))
    rmse = ate_rmse(est, np.stack(p_wc_gt), align="sim3")
    assert rmse < 0.05, rmse


def test_visual_mode_ignition():
    """Full VISUAL-mode ignition: tracks + IMU → scaled, gravity-aligned
    graph with correct metric trajectory length."""
    rng = np.random.default_rng(5)
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.6, 0.25),
                                  v_drift=(0.35, 0, 0))
    n_lm = 120
    lms = np.stack([rng.uniform(4, 12, n_lm), rng.uniform(-5, 5, n_lm),
                    rng.uniform(-3, 3, n_lm)], axis=1).astype(np.float32)
    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=20.0, max_states=32,
        solver=gn.SolverOptions(max_iterations=10)))
    done = {}
    init = SLAMInitialization(
        sm, InitParams(mode="VISUAL", min_trajectory_length_m=0.8,
                       keyframe_spacing_s=0.3, min_observability=0.1),
        ImuParams(), on_initialized=lambda r: done.update(r),
        camera=CAM, q_bc=Q_BC, p_bc=P_BC)

    imu_rate, cam_rate, T = 200.0, 10.0, 3.0
    tm = (np.arange(int(T * imu_rate)) + 0.5) / imu_rate
    s = traj.sample(jnp.asarray(tm, jnp.float32))
    cam_i = 0
    fired = False
    for i in range(len(tm)):
        init.add_imu(float(tm[i]), np.asarray(s.w_body[i]),
                     np.asarray(s.a_body[i]))
        t_cam = cam_i / cam_rate
        if tm[i] >= t_cam:
            g = traj.sample(jnp.asarray([t_cam], jnp.float32))
            ids, uvs = observe(g.q[0], g.p[0], lms)
            fired = init.add_camera_measurement(
                CameraMeasurement(round(t_cam, 6), ids, uvs, uvs)) or fired
            cam_i += 1
            if fired:
                break
    assert init.initialized and fired
    assert abs(done["scale"] - 1.0) > 1e-6  # a real scale was estimated
    # metric trajectory: graph path length ≈ GT length over the same span
    stamps = sm.current_stamps()
    est = np.stack([sm.get_state(t)["p"] for t in stamps])
    est_len = float(np.sum(np.linalg.norm(np.diff(est, axis=0), axis=1)))
    gt_path = traj.sample(jnp.asarray(stamps, jnp.float32))
    gt_len = float(np.sum(np.linalg.norm(np.diff(np.asarray(gt_path.p),
                                                 axis=0), axis=1)))
    assert abs(est_len - gt_len) / gt_len < 0.1, (est_len, gt_len)
    # gravity-aligned frame: body-frame gravity direction matches GT
    st = sm.get_state(stamps[-1])
    i = stamps.index(stamps[-1])
    g_est = np.asarray(lie.quat_rotate(
        lie.quat_conj(jnp.asarray(st["q"])), jnp.asarray([0.0, 0.0, -1.0])))
    g_gt = np.asarray(lie.quat_rotate(
        lie.quat_conj(gt_path.q[i]), jnp.asarray([0.0, 0.0, -1.0])))
    np.testing.assert_allclose(g_est, g_gt, atol=0.05)
