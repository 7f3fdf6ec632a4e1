"""Standalone-VO mode: private visual graph + relative VO factors to the
main graph (visual_odometry.cpp:330-342 / CreateVisualOdometryFactor)."""

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
from test_vio_e2e import CAM, P_BC, Q_BC, observe


def test_vo_standalone_mode():
    rng = np.random.default_rng(7)
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.6, 0.25),
                                  v_drift=(0.25, 0, 0),
                                  amp_r=(0.15, 0.12, 0.2))
    n_lm = 120
    lms = np.stack([rng.uniform(4, 12, n_lm), rng.uniform(-5, 5, n_lm),
                    rng.uniform(-3, 3, n_lm)], axis=1).astype(np.float32)

    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=6.0, max_states=32,
        solver=gn.SolverOptions(max_iterations=8)))
    sm.register_extrinsic("cam0", np.asarray(Q_BC), np.asarray(P_BC))
    io = InertialOdometry(sm, ImuParams())
    vo = VisualOdometry(
        sm, CAM, VOParams(keyframe_parallax_px=15.0, keyframe_max_dt=0.6,
                          standalone=True),
        sensor_name="cam0", trigger_cb=lambda t: io.process_trigger(t),
        frame_initializer=lambda t: io.model.get_pose(t)[:2])

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

    ids, pix = observe(g0.q[0], g0.p[0], lms, 0.3, rng)
    vo.process_measurements(CameraMeasurement(0.0, ids, pix, pix))
    cam_rate, imu_rate, T = 10.0, 200.0, 2.5
    errs = []
    t_prev = 0.0
    for k in range(1, int(T * cam_rate) + 1):
        t = k / cam_rate
        n_imu = int(imu_rate / cam_rate)
        tm = t_prev + (np.arange(n_imu) + 0.5) / imu_rate
        s = traj.sample(jnp.asarray(tm, jnp.float32))
        for i in range(n_imu):
            io.process_imu(float(tm[i]), np.asarray(s.w_body[i]),
                           np.asarray(s.a_body[i]))
        gk = traj.sample(jnp.asarray([t], jnp.float32))
        ids, pix = observe(gk.q[0], gk.p[0], lms, 0.3, rng)
        if vo.process_measurements(CameraMeasurement(t, ids, pix, pix)):
            sm.run_once()
            if t in sm.slot_of_stamp:
                st = sm.get_state(t)
                errs.append(np.linalg.norm(st["p"] - np.asarray(gk.p[0])))
        t_prev = t

    # landmarks/visual factors live ONLY in the private graph
    assert sm.lm_active.sum() == 0
    assert sm.arena_reproj.active.sum() == 0
    assert vo.local_smoother.lm_active.sum() > 20
    # the main graph got relative VO factors
    assert sm.arena_rel.active.sum() >= 2
    errs = np.asarray(errs)
    assert len(errs) >= 3
    assert errs[-1] < 0.1 and np.median(errs) < 0.1, errs


def test_vo_localization_validation_entropy_gate():
    """A degenerate localization (huge covariance → entropy spike) must be
    rejected once the rolling statistics are warmed up — the reference's
    entropy check (vo_localization_validation.cpp CheckStoredMetrics)."""
    from beam_slam_tpu.vision.validation import VOLocalizationValidation

    v = VOLocalizationValidation(list_size=15)
    rng = np.random.default_rng(0)
    cov = np.eye(6) * 1e-4
    for _ in range(15):
        assert v.validate(0.01 + rng.normal() * 1e-3,
                          0.05 + rng.normal() * 1e-3, cov, 1.0)
    # entropy spike: covariance inflated 1000x, geometry otherwise nominal
    assert not v.validate(0.01, 0.05, cov * 1e3, 1.0)
    assert "entropy" in v.last_failure
    # nominal result still accepted afterwards (outlier did not poison stats)
    assert v.validate(0.01, 0.05, cov, 1.0)


def test_vo_localization_validation_initial_thresholds():
    from beam_slam_tpu.vision.validation import VOLocalizationValidation

    v = VOLocalizationValidation()
    cov = np.eye(6) * 1e-4
    assert v.validate(0.01, 0.05, cov, 1.0)
    assert not v.validate(0.01, 5.0, cov, 1.0)       # translation jump
    assert "translation" in v.last_failure
    assert not v.validate(2.0, 0.05, cov, 1.0)       # rotation jump
    assert not v.validate(0.01, 0.05, np.eye(6), 1.0)  # entropy too high
    assert not v.validate(0.01, 0.05, cov, 100.0)    # reprojection error
