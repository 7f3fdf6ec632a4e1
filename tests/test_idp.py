"""Inverse-depth landmark tests: factor math (residual zero at GT,
structure-only recovery through the rank-1 Schur path) + the VIO pipeline in
IDP mode (ProcessLandmarkIDP parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import factors as fc
from beam_slam_tpu.core import lie
from beam_slam_tpu.core.window import WindowState
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.utils import sim

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0
INTR = np.array([FX, FY, CX, CY], np.float32)
Q_BC = lie.matrix_to_quat(jnp.asarray(
    [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], jnp.float32))
P_BC = jnp.asarray([0.1, 0.0, 0.05], jnp.float32)


def cam_pose(q_wb, p_wb):
    q = lie.quat_mul(q_wb, Q_BC)
    p = p_wb + lie.quat_rotate(q_wb, P_BC)
    return q, p


def project(q_wc, p_wc, X_w):
    X_c = lie.quat_rotate(lie.quat_conj(q_wc), X_w - p_wc)
    return jnp.stack([FX * X_c[0] / X_c[2] + CX,
                      FY * X_c[1] / X_c[2] + CY]), X_c


def build_idp_problem(n_kf=5, n_lm=25, K=8, L=32, rho_perturb=0.3, seed=0):
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory(amp_p=(0.5, 0.5, 0.2), v_drift=(0.3, 0, 0))
    gt = traj.sample(jnp.arange(n_kf, dtype=jnp.float32) * 0.4)
    lms = np.stack([rng.uniform(4, 10, n_lm), rng.uniform(-3, 3, n_lm),
                    rng.uniform(-2, 2, n_lm)], axis=1).astype(np.float32)

    window = WindowState.zeros(K, E=2, L=L)
    window = window.replace(
        imu=window.imu.replace(
            q=window.imu.q.at[:n_kf].set(gt.q),
            p=window.imu.p.at[:n_kf].set(gt.p),
            active=window.imu.active.at[:n_kf].set(True),
            held=window.imu.held.at[:n_kf].set(True)),  # structure-only
        extrinsics=window.extrinsics.replace(
            q=window.extrinsics.q.at[1].set(Q_BC),
            p=window.extrinsics.p.at[1].set(P_BC),
            active=window.extrinsics.active.at[1].set(True),
            held=window.extrinsics.held.at[1].set(True)))

    f = fc.InverseDepthReprojectionFactors.zeros(K * L)
    slots, bearings, pixels, act = [], [], [], 0
    rho_true = np.zeros(n_lm, np.float32)
    for l in range(n_lm):
        q0_wc, p0_wc = cam_pose(gt.q[0], gt.p[0])
        uv0, X_c0 = project(q0_wc, p0_wc, jnp.asarray(lms[l]))
        if float(X_c0[2]) < 0.5:
            continue
        bearing = np.asarray([(float(uv0[0]) - CX) / FX,
                              (float(uv0[1]) - CY) / FY], np.float32)
        rho_true[l] = 1.0 / float(X_c0[2])
        for i in range(1, n_kf):
            qi_wc, pi_wc = cam_pose(gt.q[i], gt.p[i])
            uvi, X_ci = project(qi_wc, pi_wc, jnp.asarray(lms[l]))
            if float(X_ci[2]) < 0.5:
                continue
            slots.append((0, i, 1, l))
            bearings.append(bearing)
            pixels.append(np.asarray(uvi))
            act += 1
    n_f = len(slots)
    f = f.replace(
        slots=f.slots.at[:n_f].set(jnp.asarray(slots, jnp.int32)),
        active=f.active.at[:n_f].set(True),
        bearing=f.bearing.at[:n_f].set(jnp.asarray(np.stack(bearings))),
        pixel=f.pixel.at[:n_f].set(jnp.asarray(np.stack(pixels))),
        intr=f.intr.at[:, :].set(jnp.asarray(INTR)),
        sqrt_info=f.sqrt_info.at[:n_f].set(jnp.eye(2)))

    rho_init = rho_true * (1.0 + rng.uniform(-rho_perturb, rho_perturb,
                                             n_lm).astype(np.float32))
    lm_store = np.zeros((L, 3), np.float32)
    lm_store[:n_lm, 0] = rho_init
    window = window.replace(landmarks=window.landmarks.replace(
        pt=jnp.asarray(lm_store),
        active=window.landmarks.active.at[:n_lm].set(
            jnp.asarray(rho_true > 0))))
    return window, f, rho_true, n_lm


def test_idp_residual_zero_at_gt():
    window, f, rho_true, n_lm = build_idp_problem(rho_perturb=0.0)
    r = f.residual_only(window)
    assert np.abs(np.asarray(r)).max() < 5e-2  # f32 projection roundtrip


def test_idp_structure_recovery_via_schur():
    """Perturbed inverse depths must be recovered through the rank-1 landmark
    Schur elimination (components 1,2 must remain untouched)."""
    window, f, rho_true, n_lm = build_idp_problem(rho_perturb=0.3)
    out, diag = gn.solve(window, (f,), (None,),
                         gn.SolverOptions(max_iterations=15))
    assert float(diag.final_cost) < 1e-3 * float(diag.initial_cost)
    rho_est = np.asarray(out.landmarks.pt[:n_lm, 0])
    sel = rho_true > 0
    rel_err = np.abs(rho_est[sel] - rho_true[sel]) / rho_true[sel]
    assert rel_err.max() < 0.02, rel_err.max()
    # the unused landmark components never move
    np.testing.assert_allclose(np.asarray(out.landmarks.pt[:n_lm, 1:]), 0.0,
                               atol=1e-6)


def test_vio_idp_e2e():
    """Short VIO run with landmark_type=IDP through the full pipeline
    (reuses the EUC e2e harness helpers)."""
    from test_vio_e2e import (CAM, P_BC as P_BC_E, Q_BC as Q_BC_E, observe)
    from beam_slam_tpu.models.inertial_odometry import (ImuParams,
                                                        InertialOdometry)
    from beam_slam_tpu.models.visual_feature_tracker import CameraMeasurement
    from beam_slam_tpu.models.visual_odometry import VisualOdometry, VOParams
    from beam_slam_tpu.solver.smoother import (FixedLagSmoother,
                                               SmootherConfig, Transaction)

    rng = np.random.default_rng(7)
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.6, 0.25),
                                  v_drift=(0.25, 0, 0),
                                  amp_r=(0.15, 0.12, 0.2))
    n_lm = 100
    lms = np.stack([rng.uniform(4, 12, n_lm), rng.uniform(-5, 5, n_lm),
                    rng.uniform(-3, 3, n_lm)], axis=1).astype(np.float32)
    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=6.0, max_states=32, max_landmarks=256,
        max_idp_factors=2048, solver=gn.SolverOptions(max_iterations=8)))
    sm.register_extrinsic("cam0", np.asarray(Q_BC_E), np.asarray(P_BC_E))
    io = InertialOdometry(sm, ImuParams())
    vo = VisualOdometry(
        sm, CAM, VOParams(keyframe_parallax_px=15.0, keyframe_max_dt=0.6,
                          landmark_type="IDP"),
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

    assert sm.arena_idp.active.sum() > 20, "IDP factors flowed"
    assert sm.arena_reproj.active.sum() == 0, "no EUC factors in IDP mode"
    errs = np.asarray(errs)
    assert errs[-1] < 0.08 and np.median(errs) < 0.08, errs


def test_unary_idp_reprojection_converges():
    """Unary variant: anchor camera pose fixed as a parameter; measurement
    pose + rho optimized (inversedepth_reprojection_functor.h unary)."""
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0])
    # anchor at origin; landmark at bearing (0.1, -0.05), depth 5
    bearing = jnp.asarray([0.1, -0.05])
    rho_gt = 0.2
    X_w = jnp.concatenate([bearing, jnp.ones(1)]) / rho_gt
    # measurement keyframe at a translated pose
    q_m = lie.so3_exp_quat(jnp.asarray([0.0, 0.02, 0.0]))
    p_m = jnp.asarray([0.5, 0.1, 0.0])
    X_c = lie.quat_rotate(lie.quat_conj(q_m), X_w - p_m)
    pix = jnp.asarray([400.0 * X_c[0] / X_c[2] + 320.0,
                       400.0 * X_c[1] / X_c[2] + 240.0])

    K = 2
    window = WindowState.zeros(K, E=1, L=2)
    window = window.replace(
        imu=window.imu.replace(
            q=window.imu.q.at[0].set(lie.quat_mul(q_m, lie.so3_exp_quat(
                jnp.asarray([0.01, -0.01, 0.02])))),
            p=window.imu.p.at[0].set(p_m + jnp.asarray([0.05, -0.04, 0.03])),
            active=window.imu.active.at[0].set(True)),
        extrinsics=window.extrinsics.replace(
            active=window.extrinsics.active.at[0].set(True),
            held=window.extrinsics.held.at[0].set(True)),
        landmarks=window.landmarks.replace(
            pt=window.landmarks.pt.at[0].set(
                jnp.asarray([rho_gt * 1.3, 0, 0])),
            active=window.landmarks.active.at[0].set(True)))

    fam = fc.InverseDepthUnaryReprojectionFactors.zeros(4)
    fam = fam.replace(
        slots=fam.slots.at[0].set(jnp.asarray([0, 0, 0])),
        active=fam.active.at[0].set(True),
        bearing=fam.bearing.at[0].set(bearing),
        pixel=fam.pixel.at[0].set(pix),
        intr=fam.intr.at[0].set(intr),
        sqrt_info=fam.sqrt_info.at[0].set(jnp.eye(2)))
    # a weak pose prior pins the gauge; rho + pose refine jointly
    prior = fc.AbsolutePoseFactors.zeros(1)
    prior = prior.replace(
        slots=prior.slots.at[0, 0].set(0),
        active=prior.active.at[0].set(True),
        q0=prior.q0.at[0].set(q_m), p0=prior.p0.at[0].set(p_m),
        sqrt_info=prior.sqrt_info.at[0].set(1e3 * jnp.eye(6)))
    out, diag = gn.solve(window, (fam, prior), (None, None),
                         gn.SolverOptions(max_iterations=15))
    assert float(diag.final_cost) < 1e-6
    rho_est = float(out.landmarks.pt[0, 0])
    assert abs(rho_est - rho_gt) < 1e-3, rho_est
