"""Inertial alignment + SLAM initialization tests (reference pattern:
inertial_alignment math validated on synthetic trajectories; ignition flow
builds and solves the init graph — slam_initialization.cpp:280-372)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.core.factors import GRAVITY_WORLD
from beam_slam_tpu.imu import alignment
from beam_slam_tpu.imu import preintegration as pre
from beam_slam_tpu.models.slam_initialization import (InitParams,
                                                      SLAMInitialization)
from beam_slam_tpu.models.inertial_odometry import ImuParams
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import FixedLagSmoother, SmootherConfig
from beam_slam_tpu.utils import sim

RATE = 200.0


def make_rotated_world_data(T=4.0, kf_dt=0.4, bg_true=None, rot=None,
                            seed=0):
    """GT in the gravity-aligned world, then the whole world rotated by
    ``rot`` — body-frame IMU measurements are invariant, so alignment must
    recover the rotated gravity direction (and any injected gyro bias)."""
    traj = sim.AnalyticTrajectory(amp_p=(0.8, 0.7, 0.4),
                                  v_drift=(0.4, 0.1, 0.0))
    n_kf = int(T / kf_dt) + 1
    kf_t = np.arange(n_kf) * kf_dt
    gt = traj.sample(jnp.asarray(kf_t, jnp.float32))
    n_imu = int(T * RATE)
    t_imu = (np.arange(n_imu) + 0.5) / RATE
    s = traj.sample(jnp.asarray(t_imu, jnp.float32))
    w = np.asarray(s.w_body)
    a = np.asarray(s.a_body)
    if bg_true is not None:
        w = w + bg_true[None, :]
    q_path = np.asarray(gt.q)
    p_path = np.asarray(gt.p)
    v_path = np.asarray(gt.v)
    if rot is not None:
        qr = lie.so3_exp_quat(jnp.asarray(rot, jnp.float32))
        q_path = np.asarray(lie.quat_mul(qr[None], jnp.asarray(q_path)))
        p_path = np.asarray(lie.quat_rotate(qr[None], jnp.asarray(p_path)))
        v_path = np.asarray(lie.quat_rotate(qr[None], jnp.asarray(v_path)))
    return kf_t, q_path, p_path, v_path, t_imu, w, a


NOISE = pre.PreintNoise.isotropic(1e-4, 1e-3, 1e-6, 1e-5)


def test_alignment_recovers_gravity_and_bias():
    bg_true = np.array([0.015, -0.02, 0.01])
    rot = np.array([0.3, -0.2, 0.5])
    kf_t, q_path, p_path, v_path, t_imu, w, a = make_rotated_world_data(
        bg_true=bg_true, rot=rot)
    res = alignment.estimate_parameters(kf_t, q_path, p_path, t_imu, w, a,
                                        NOISE)
    assert res.success
    np.testing.assert_allclose(res.bg, bg_true, atol=2e-3)
    # gravity in the rotated world frame
    qr = lie.so3_exp_quat(jnp.asarray(rot, jnp.float32))
    g_expected = np.asarray(lie.quat_rotate(qr, GRAVITY_WORLD))
    cos = np.dot(res.gravity, g_expected) / (
        np.linalg.norm(res.gravity) * np.linalg.norm(g_expected))
    assert cos > 0.999, (res.gravity, g_expected)
    assert abs(res.scale - 1.0) < 0.05
    # velocities near GT (rotated world)
    v_err = np.linalg.norm(res.velocities - v_path, axis=1)
    assert np.median(v_err) < 0.1, v_err


def test_alignment_rejects_low_excitation():
    """Constant-velocity motion has no accel excitation → observability gate
    must fire (inertial_alignment.cpp:84-88)."""
    kf_t = np.arange(10) * 0.4
    q_path = np.tile(np.array([1, 0, 0, 0], np.float32), (10, 1))
    p_path = np.stack([kf_t, np.zeros(10), np.zeros(10)], 1).astype(np.float32)
    n = int(4.0 * RATE)
    t_imu = (np.arange(n) + 0.5) / RATE
    w = np.zeros((n, 3), np.float32)
    a = np.tile(-np.asarray(GRAVITY_WORLD, np.float32), (n, 1))  # stationary accel
    res = alignment.estimate_parameters(kf_t, q_path, p_path, t_imu, w, a,
                                        NOISE)
    assert not res.success
    assert res.observability < 0.25


def test_frameinit_ignition_flow():
    """FRAMEINIT mode: feed a (rotated-world) path + biased IMU → ignition
    must align the path to gravity, seed biases, and populate the graph."""
    bg_true = np.array([0.01, -0.015, 0.02])
    rot = np.array([0.2, 0.25, -0.1])
    kf_t, q_path, p_path, v_path, t_imu, w, a = make_rotated_world_data(
        bg_true=bg_true, rot=rot, T=4.0)

    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=10.0, max_states=32,
        solver=gn.SolverOptions(max_iterations=10)))
    done = {}
    init = SLAMInitialization(
        sm, InitParams(mode="FRAMEINIT", min_trajectory_length_m=2.0),
        ImuParams(), on_initialized=lambda r: done.update(r))

    # interleave: stream IMU, then poses
    for i in range(len(t_imu)):
        init.add_imu(t_imu[i], w[i], a[i])
    fired = False
    for i in range(len(kf_t)):
        fired = init.add_pose(float(kf_t[i]), q_path[i], p_path[i]) or fired
    assert init.initialized and fired
    assert done, "on_initialized callback"
    np.testing.assert_allclose(done["bg"], bg_true, atol=3e-3)

    # graph populated with the aligned path (pruned to keyframe_spacing_s,
    # so the 0.4 s pose stream ignites every other pose); IMU factors present
    stamps = sm.current_stamps()
    assert len(stamps) >= 4
    assert sm.arena_imu.active.sum() >= len(stamps) - 2
    # aligned world: per-state gravity direction must be ≈ [0,0,-1] in world,
    # i.e. the optimized orientations must match the *unrotated* GT up to a
    # yaw offset. Check: rotating body-z gravity measurement into world gives
    # -z. Use the alignment result directly:
    g = done["gravity"]
    # after alignment the ignition path was rotated so gravity ∥ -z;
    # solved graph keeps that frame: check pitch/roll of first state ≈ GT's
    traj = sim.AnalyticTrajectory(amp_p=(0.8, 0.7, 0.4),
                                  v_drift=(0.4, 0.1, 0.0))
    gt = traj.sample(jnp.asarray(kf_t, jnp.float32))
    st = sm.get_state(stamps[1])
    # gravity direction in body frame must match GT's (yaw-invariant check)
    g_body_est = np.asarray(lie.quat_rotate(
        lie.quat_conj(jnp.asarray(st["q"])), jnp.asarray([0., 0., -1.])))
    i = stamps.index(stamps[1])
    g_body_gt = np.asarray(lie.quat_rotate(
        lie.quat_conj(gt.q[list(kf_t).index(stamps[1])]),
        jnp.asarray([0., 0., -1.])))
    np.testing.assert_allclose(g_body_est, g_body_gt, atol=0.03)
