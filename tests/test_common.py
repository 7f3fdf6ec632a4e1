"""Tests for the common substrate added around the core: extrinsics lookup,
frame initializer, publishers, diagnostics, artifacts, the Unicycle3D motion
model, and the scan deskewer model."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.core.extrinsics import ExtrinsicsLookup
from beam_slam_tpu.core.utils import (add_zero_motion_factor,
                                      shannon_entropy_from_pose_covariance)
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.models.lidar_scan_deskewer import LidarScanDeskewer
from beam_slam_tpu.models.unicycle_3d import Unicycle3D, Unicycle3DParams
from beam_slam_tpu.obs import artifacts, diagnostics
from beam_slam_tpu.obs.publishers import (Odometry3DPublisher,
                                          Path3DPublisher)
from beam_slam_tpu.pipeline.frame_initializer import FrameInitializer
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import (FixedLagSmoother, SmootherConfig,
                                           Transaction)


def test_extrinsics_lookup_roundtrip(tmp_path):
    ex = ExtrinsicsLookup()
    q_bc = np.asarray(lie.so3_exp_quat(jnp.asarray([0.1, 0.2, -0.3],
                                                   jnp.float32)))
    ex.set("imu", "camera", q_bc, [0.1, 0.0, 0.05])
    ex.set("imu", "lidar", [1, 0, 0, 0], [0.0, 0.0, -0.1])
    # inverse auto-registered
    q, p = ex.get("camera", "imu")
    q2, p2 = ex.get_T_CAMERA_IMU()
    np.testing.assert_allclose(q, q2)
    # composition camera → lidar through the baselink
    q_cl, p_cl = ex.get("camera", "lidar")
    assert np.isfinite(p_cl).all()
    # identity
    qi, pi = ex.get("imu", "imu")
    np.testing.assert_allclose(qi, [1, 0, 0, 0])
    # JSON round-trip
    path = str(tmp_path / "extrinsics.json")
    ex.save(path)
    ex2 = ExtrinsicsLookup.load(path)
    q3, p3 = ex2.get_T_BASELINK_CAMERA()
    q0, p0 = ex.get_T_BASELINK_CAMERA()
    np.testing.assert_allclose(q3, q0, atol=1e-6)
    np.testing.assert_allclose(p3, p0, atol=1e-6)
    with pytest.raises(KeyError):
        ex.get("camera", "nonexistent")


def test_frame_initializer_interpolation_and_correction():
    fi = FrameInitializer()
    for i in range(5):
        fi.add_odometry(float(i), [1, 0, 0, 0], [float(i), 0, 0])
    q, p = fi.get_pose(2.5)
    np.testing.assert_allclose(p, [2.5, 0, 0], atol=1e-6)
    dq, dp = fi.get_relative_pose(1.0, 3.0)
    np.testing.assert_allclose(dp, [2.0, 0, 0], atol=1e-6)
    # graph correction: graph says pose at t=2 is shifted +1 in y
    assert fi.update_graph_correction(2.0, [1, 0, 0, 0], [2.0, 1.0, 0.0])
    q, p = fi.get_pose(2.5)
    np.testing.assert_allclose(p, [2.5, 1.0, 0], atol=1e-5)
    # relative pose unaffected by the rigid correction
    dq, dp = fi.get_relative_pose(1.0, 3.0)
    np.testing.assert_allclose(dp, [2.0, 0, 0], atol=1e-6)


def _simple_smoother():
    sm = FixedLagSmoother(SmootherConfig(
        max_states=8, solver=gn.SolverOptions(max_iterations=5)))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, [1, 0, 0, 0], [0, 0, 0], [1, 0, 0])
    txn.add_imu_prior(0.0, [1, 0, 0, 0], [0, 0, 0], [1, 0, 0],
                      np.zeros(3), np.zeros(3),
                      1e2 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    return sm


def test_publishers_fire_on_update():
    sm = _simple_smoother()
    odom = Odometry3DPublisher(sm)
    path = Path3DPublisher(sm)
    got = []
    odom.subscribe(got.append)
    sm.run_once()
    assert len(got) == 1
    np.testing.assert_allclose(got[0].v, [1, 0, 0], atol=1e-3)
    assert len(path.latest_path) == 1


def test_diagnostics_and_graph_validation():
    sm = _simple_smoother()
    warns = []
    d = diagnostics.SmootherDiagnostics(sm, optimization_period=1e-9,
                                        warn_cb=warns.append)
    d.run_once_timed()
    rep = d.report()
    assert rep["solve_count"] == 1 and rep["overruns"] == 1
    assert warns and "exceeded" in warns[0]
    assert diagnostics.validate_graph(sm) == []
    # orphan state → flagged
    txn = Transaction(stamp=1.0)
    txn.add_imu_state(1.0, [1, 0, 0, 0], [1, 0, 0], [0, 0, 0])
    sm.send_transaction(txn)
    sm._pending, pending = [], sm._pending
    for t in pending:
        sm._apply(t)
    problems = diagnostics.validate_graph(sm)
    assert any("no factor" in p for p in problems)


def test_artifacts_roundtrip(tmp_path):
    sm = _simple_smoother()
    sm.run_once()
    d = str(tmp_path / "artifacts")
    artifacts.save_graph_artifacts(sm, d)
    traj = artifacts.read_trajectory_tum(d + "/trajectory_tum.txt")
    assert len(traj) == 1
    pts = artifacts.read_ply(d + "/graph_poses.ply")
    assert len(pts) > 0


def test_unicycle_motion_model_constrains_chain():
    """With only a prior on state 0 and const-velocity factors, later states
    must follow the constant-velocity prediction."""
    sm = FixedLagSmoother(SmootherConfig(
        max_states=8, solver=gn.SolverOptions(max_iterations=10)))
    uni = Unicycle3D(sm, Unicycle3DParams(sigma_rot=0.01, sigma_pos=0.01,
                                          sigma_vel=0.01))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, [1, 0, 0, 0], [0, 0, 0], [1.0, 0.5, 0])
    txn.add_imu_prior(0.0, [1, 0, 0, 0], [0, 0, 0], [1.0, 0.5, 0],
                      np.zeros(3), np.zeros(3),
                      1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    # new state with a bad initial guess, no sensor factor — only the motion
    # model ties it to state 0
    txn = Transaction(stamp=1.0)
    txn.add_imu_state(1.0, [1, 0, 0, 0], [5.0, -3.0, 2.0], [0, 0, 0])
    sm.send_transaction(txn)
    sm.run_once()
    assert sm.arena_motion.active.sum() == 1
    st = sm.get_state(1.0)
    np.testing.assert_allclose(st["p"], [1.0, 0.5, 0.0], atol=0.05)
    np.testing.assert_allclose(st["v"], [1.0, 0.5, 0.0], atol=0.05)


def test_zero_motion_and_entropy():
    txn = Transaction(stamp=0.0)
    add_zero_motion_factor(txn, 0.0, 0.5)
    assert len(txn.rel_poses) == 1
    np.testing.assert_allclose(txn.rel_poses[0].dp, np.zeros(3))
    h_small = shannon_entropy_from_pose_covariance(1e-6 * np.eye(6))
    h_big = shannon_entropy_from_pose_covariance(1e-2 * np.eye(6))
    assert h_big > h_small
    assert shannon_entropy_from_pose_covariance(np.zeros((6, 6))) == \
        float("inf")


def test_deskewer_model_passthrough_and_compensation():
    grid = synthetic_structured_scene(n_rings=16, width=504)
    # no poses available → passthrough
    d = LidarScanDeskewer(lambda t: None)
    out = d.process_scan(0.0, grid)
    assert out is grid and d.published == 0
    # static poses → identity compensation
    d2 = LidarScanDeskewer(lambda t: (np.array([1, 0, 0, 0], np.float32),
                                      np.zeros(3, np.float32)))
    out2 = d2.process_scan(0.0, grid)
    assert d2.published == 1
    np.testing.assert_allclose(np.asarray(out2.xyz), np.asarray(grid.xyz),
                               atol=1e-5)
