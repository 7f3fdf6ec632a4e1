"""Smoother robustness protocol — the degradation behaviors of the reference
fixed-lag smoother (bs_optimizers/src/fixed_lag_smoother.cpp):

* transaction timeout + per-cycle sensor blacklisting (:442-474)
* faulty-constraint scrub after marginalization (:199-216)
* wall-clock solver budget (optimizeFor / max_solver_time, lvio.yaml:14)
* graceful capacity overflow (the reference degrades, it does not die)
* marginal pose covariance + Shannon entropy recovery
  (vo_localization_validation.h:32-63, bs_common/utils.h:79)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.imu import preintegration as pre
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import (FixedLagSmoother, SmootherConfig,
                                           Transaction)
from beam_slam_tpu.utils import sim

NOISE = pre.PreintNoise.isotropic(1e-4, 1e-3, 1e-6, 1e-5)
RATE = 100.0


def small_cfg(**kw):
    defaults = dict(
        lag_duration=4.0, max_states=8, max_extrinsics=2, max_landmarks=8,
        max_imu_factors=16, max_prior_factors=4, max_rel_pose_factors=8,
        max_abs_pose_factors=4, max_gravity_factors=4,
        max_reprojection_factors=16, max_motion_factors=4, max_idp_factors=4,
        max_marginal_factors=4,
        solver=gn.SolverOptions(max_iterations=6, scan_length=6))
    defaults.update(kw)
    return SmootherConfig(**defaults)


def preint_segment(traj, t0, t1):
    n = max(int(round((t1 - t0) * RATE)), 1)
    dt = (t1 - t0) / n
    t_mid = t0 + (jnp.arange(n, dtype=jnp.float32) + 0.5) * dt
    s = traj.sample(t_mid)
    return pre.preintegrate(jnp.full((n,), dt, jnp.float32), s.w_body,
                            s.a_body, jnp.zeros(3), jnp.zeros(3), NOISE)


def ignite(sm, traj):
    g0 = traj.sample(jnp.zeros((1,), jnp.float32))
    txn = Transaction(stamp=0.0, sensor_id="init")
    txn.add_imu_state(0.0, g0.q[0], g0.p[0], g0.v[0])
    txn.add_imu_prior(0.0, g0.q[0], g0.p[0], g0.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    return g0


def chain_step(sm, traj, t0, t1, sensor="imu"):
    d = preint_segment(traj, t0, t1)
    g = traj.sample(jnp.asarray([t1], jnp.float32))
    txn = Transaction(stamp=t1, sensor_id=sensor)
    txn.add_imu_state(t1, g.q[0], g.p[0], g.v[0])
    txn.add_imu_relative(t0, t1, d, np.zeros(3), np.zeros(3))
    sm.send_transaction(txn)
    sm.run_once()


def test_flood_past_every_capacity_degrades_never_raises():
    """Flood the smoother with more states, landmarks, and factors than any
    arena can hold, with a lag so long nothing expires naturally. It must
    keep running (forced marginalization + eviction), never raise."""
    traj = sim.AnalyticTrajectory()
    sm = FixedLagSmoother(small_cfg(lag_duration=1e6))
    ignite(sm, traj)
    lm_id = 0
    for i in range(1, 25):  # 25 states into max_states=8
        t0, t1 = (i - 1) * 0.5, i * 0.5
        d = preint_segment(traj, t0, t1)
        g = traj.sample(jnp.asarray([t1], jnp.float32))
        txn = Transaction(stamp=t1, sensor_id="imu")
        txn.add_imu_state(t1, g.q[0], g.p[0], g.v[0])
        txn.add_imu_relative(t0, t1, d, np.zeros(3), np.zeros(3))
        # 3 new landmarks + observations per keyframe → overflows L=8 fast
        for _ in range(3):
            txn.add_landmark(lm_id, np.asarray(g.p[0]) + [5.0, 0, 0])
            txn.add_reprojection(
                t1, lm_id, np.zeros(2), np.asarray([500, 500, 320, 240.0]),
                np.eye(2, dtype=np.float32))
            lm_id += 1
        sm.send_transaction(txn)
        sm.run_once()
    assert int(sm.state_active.sum()) <= 8
    assert int(sm.lm_active.sum()) <= 8
    assert sm.counters["forced_state_marginalizations"] > 0
    assert sm.counters["landmark_evictions"] > 0
    assert np.isfinite(float(sm.last_diagnostics.final_cost))


def test_transaction_timeout_and_sensor_blacklist():
    traj = sim.AnalyticTrajectory()
    sm = FixedLagSmoother(small_cfg(transaction_timeout=0.3))
    ignite(sm, traj)
    # factor referencing a stamp that never existed → unappliable
    bad = Transaction(stamp=0.5, sensor_id="lidar")
    bad.add_relative_pose(0.25, 0.5, np.array([1, 0, 0, 0.0]), np.zeros(3),
                          np.eye(6, dtype=np.float32))
    sm.send_transaction(bad)
    sm.run_once()
    # retried: still pending, sensor blacklisted for the cycle
    assert len(sm._pending) == 1
    assert "lidar" in sm.blacklisted_sensors
    assert sm.counters["dropped_transactions"] == 0
    # pipeline clock advances past stamp+timeout → transaction dropped
    chain_step(sm, traj, 0.0, 1.0)
    assert len(sm._pending) == 0
    assert sm.counters["dropped_transactions"] == 1
    # a later, valid transaction from the same sensor goes through
    ok = Transaction(stamp=1.0, sensor_id="lidar")
    g = traj.sample(jnp.asarray([1.0], jnp.float32))
    ok.add_abs_pose(1.0, g.q[0], g.p[0], 1e2 * np.eye(6, dtype=np.float32))
    sm.send_transaction(ok)
    sm.run_once()
    assert len(sm._pending) == 0
    assert int(sm.arena_abs.active.sum()) == 1


def test_scrub_of_marginalized_references():
    traj = sim.AnalyticTrajectory()
    sm = FixedLagSmoother(small_cfg(lag_duration=1.0))
    ignite(sm, traj)
    for i in range(1, 7):
        chain_step(sm, traj, (i - 1) * 0.5, i * 0.5)
    # stamps below 3.0 - 1.0 are gone
    assert 0.5 not in sm.slot_of_stamp
    assert 0.5 in sm._last_marginalized_stamps
    # transaction with one factor on a marginalized stamp + one valid factor
    txn = Transaction(stamp=3.0, sensor_id="lidar")
    txn.add_abs_pose(0.5, np.array([1, 0, 0, 0.0]), np.zeros(3),
                     np.eye(6, dtype=np.float32))   # → scrubbed
    g = traj.sample(jnp.asarray([3.0], jnp.float32))
    txn.add_abs_pose(3.0, g.q[0], g.p[0], 1e2 * np.eye(6, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    assert sm.counters["scrubbed_factors"] >= 1
    assert len(sm._pending) == 0
    assert int(sm.arena_abs.active.sum()) == 1  # only the valid one


def test_solver_wall_clock_budget_downshifts():
    traj = sim.AnalyticTrajectory()
    sm = FixedLagSmoother(small_cfg(max_solver_time_s=1e-9,
                                    downshift_scan_length=2))
    ignite(sm, traj)
    chain_step(sm, traj, 0.0, 0.5)
    assert sm.counters["solve_downshifts"] >= 1
    # subsequent ticks run the short executable and still solve
    chain_step(sm, traj, 0.5, 1.0)
    assert np.isfinite(float(sm.last_diagnostics.final_cost))
    assert sm._downshift_left < sm.cfg.downshift_hold_ticks


def test_pose_covariance_and_entropy_recovery():
    traj = sim.AnalyticTrajectory()
    w = 10.0  # prior sqrt-information weight
    sm = FixedLagSmoother(small_cfg())
    g0 = traj.sample(jnp.zeros((1,), jnp.float32))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, g0.q[0], g0.p[0], g0.v[0])
    txn.add_imu_prior(0.0, g0.q[0], g0.p[0], g0.v[0], np.zeros(3),
                      np.zeros(3), w * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    cov = sm.get_pose_covariance(0.0)
    # single state, isotropic prior: marginal pose covariance = 1/w^2 I
    np.testing.assert_allclose(cov, np.eye(6) / w**2, rtol=0.05, atol=1e-4)
    h_loose = sm.get_pose_entropy(0.0)

    # tighter prior → lower entropy
    sm2 = FixedLagSmoother(small_cfg())
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, g0.q[0], g0.p[0], g0.v[0])
    txn.add_imu_prior(0.0, g0.q[0], g0.p[0], g0.v[0], np.zeros(3),
                      np.zeros(3), 100.0 * w * np.eye(15, dtype=np.float32))
    sm2.send_transaction(txn)
    sm2.run_once()
    assert sm2.get_pose_entropy(0.0) < h_loose
