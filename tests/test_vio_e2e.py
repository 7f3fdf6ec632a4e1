"""End-to-end VIO: synthetic landmark field + IMU stream driven through
VisualOdometry + InertialOdometry + the fixed-lag smoother — the VIO
milestone (BASELINE.json config #3; 'full visual-inertial bundle adjustment'
with pseudo-marginalization)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.models.inertial_odometry import ImuParams, InertialOdometry
from beam_slam_tpu.models.visual_feature_tracker import CameraMeasurement
from beam_slam_tpu.models.visual_odometry import VisualOdometry, VOParams
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import (FixedLagSmoother, SmootherConfig,
                                           Transaction)
from beam_slam_tpu.utils import sim
from beam_slam_tpu.vision.camera import PinholeRadtan

CAM = PinholeRadtan(400.0, 400.0, 320.0, 240.0)
# camera z forward along body x
Q_BC = lie.matrix_to_quat(jnp.asarray(
    [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], jnp.float32))
P_BC = jnp.asarray([0.1, 0.0, 0.05], jnp.float32)


def camera_pose(q_wb, p_wb):
    q_wc = lie.quat_mul(jnp.asarray(q_wb), Q_BC)
    p_wc = jnp.asarray(p_wb) + lie.quat_rotate(jnp.asarray(q_wb), P_BC)
    return q_wc, p_wc


def observe(q_wb, p_wb, lms, noise_px, rng):
    """Project the landmark field; return a CameraMeasurement."""
    q_wc, p_wc = camera_pose(q_wb, p_wb)
    X_c = lie.quat_rotate(lie.quat_conj(q_wc)[None], jnp.asarray(lms) - p_wc)
    uv, valid = CAM.project(np.asarray(X_c))
    uv = np.asarray(uv)
    valid = np.asarray(valid)
    ids = np.nonzero(valid)[0]
    pix = uv[valid]
    if noise_px > 0:
        pix = pix + rng.standard_normal(pix.shape).astype(np.float32) * noise_px
    return ids.astype(np.int64), pix.astype(np.float32)


@pytest.mark.parametrize("noise_px", [0.0, 0.5])
def test_vio_pipeline_tracks_trajectory(noise_px):
    rng = np.random.default_rng(7)
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.6, 0.25),
                                  v_drift=(0.25, 0, 0),
                                  amp_r=(0.15, 0.12, 0.2))
    n_lm = 120
    lms = np.stack([rng.uniform(4, 12, n_lm), rng.uniform(-5, 5, n_lm),
                    rng.uniform(-3, 3, n_lm)], axis=1).astype(np.float32)

    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=6.0, max_states=32, max_landmarks=256,
        max_reprojection_factors=4096,
        solver=gn.SolverOptions(max_iterations=8)))
    sm.register_extrinsic("cam0", np.asarray(Q_BC), np.asarray(P_BC))
    io = InertialOdometry(sm, ImuParams())
    vo = VisualOdometry(
        sm, CAM,
        VOParams(keyframe_parallax_px=15.0, keyframe_max_dt=0.6),
        sensor_name="cam0",
        trigger_cb=lambda t: io.process_trigger(t),
        frame_initializer=lambda t: io.model.get_pose(t)[:2])

    # ignition at t=0 (SLAMInitialization's role)
    g0 = traj.sample(jnp.zeros((1,), jnp.float32))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, g0.q[0], g0.p[0], g0.v[0])
    txn.add_imu_prior(0.0, g0.q[0], g0.p[0], g0.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    io.initialize(0.0, np.asarray(g0.q[0]), np.asarray(g0.p[0]),
                  np.asarray(g0.v[0]))
    vo.initialize(0.0)

    cam_rate, imu_rate, T = 10.0, 200.0, 3.0
    errs = []
    t_prev = 0.0
    # the very first frame must be processed at t=0 to become keyframe 0
    ids, pix = observe(g0.q[0], g0.p[0], lms, noise_px, rng)
    vo.process_measurements(CameraMeasurement(0.0, ids, pix, pix))

    n_frames = int(T * cam_rate)
    for k in range(1, n_frames + 1):
        t = k / cam_rate
        n_imu = int(imu_rate / cam_rate)
        tm = t_prev + (np.arange(n_imu) + 0.5) / imu_rate
        s = traj.sample(jnp.asarray(tm, jnp.float32))
        for i in range(n_imu):
            io.process_imu(float(tm[i]), np.asarray(s.w_body[i]),
                           np.asarray(s.a_body[i]))
        gk = traj.sample(jnp.asarray([t], jnp.float32))
        ids, pix = observe(gk.q[0], gk.p[0], lms, noise_px, rng)
        made_kf = vo.process_measurements(
            CameraMeasurement(t, ids, pix, pix))
        if made_kf:
            sm.run_once()
            if t in sm.slot_of_stamp:
                st = sm.get_state(t)
                errs.append(np.linalg.norm(st["p"] - np.asarray(gk.p[0])))
        t_prev = t

    assert len(vo.keyframes) >= 4
    assert sm.lm_active.sum() >= 30          # map was built
    errs = np.asarray(errs)
    tol = 0.03 if noise_px == 0 else 0.08
    assert errs[-1] < tol, errs
    assert np.median(errs) < tol
    # landmarks near GT
    lm_err = []
    for lm_id, slot in sm.slot_of_lm_id.items():
        if sm.lm_active[slot]:
            lm_err.append(np.linalg.norm(sm.lm_pt[slot] - lms[lm_id]))
    # landmarks sit at 4-12 m with ~0.5 m baselines: 0.1 m ≈ 0.3 px of
    # equivalent bearing error — the f32 floor for this geometry
    assert np.median(lm_err) < (0.12 if noise_px == 0 else 0.25), \
        np.median(lm_err)


def test_vo_fallback_and_failure_counter():
    """Localization failure (no landmarks) must fall back to the seed and
    count failures (visual_odometry.cpp:267-295)."""
    sm = FixedLagSmoother(SmootherConfig(max_states=8))
    sm.register_extrinsic("cam0", np.asarray(Q_BC), np.asarray(P_BC))
    vo = VisualOdometry(sm, CAM, VOParams(),
                        frame_initializer=lambda t: (
                            np.array([1, 0, 0, 0], np.float32),
                            np.zeros(3, np.float32)))
    vo.initialize(0.0)
    meas = CameraMeasurement(0.1, np.arange(5), np.zeros((5, 2), np.float32),
                             np.zeros((5, 2), np.float32))
    vo.process_measurements(meas)
    assert vo.failures == 1
    # pose fell back to seed
    t, q, p = vo.odometry_log[-1]
    np.testing.assert_allclose(p, np.zeros(3), atol=0)
