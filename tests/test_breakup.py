"""BreakupConstraint: a trigger landing inside an existing IMU factor
interval must split it into two factors with a new state at the trigger
stamp (inertial_odometry.cpp BreakupConstraint)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.models.inertial_odometry import ImuParams, InertialOdometry
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import (FixedLagSmoother, SmootherConfig,
                                           Transaction)
from beam_slam_tpu.utils import sim


def test_breakup_constraint_splits_factor():
    traj = sim.AnalyticTrajectory()
    sm = FixedLagSmoother(SmootherConfig(
        max_states=8, solver=gn.SolverOptions(max_iterations=8)))
    io = InertialOdometry(sm, ImuParams())

    g0 = traj.sample(jnp.zeros((1,), jnp.float32))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, g0.q[0], g0.p[0], g0.v[0])
    txn.add_imu_prior(0.0, g0.q[0], g0.p[0], g0.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    io.initialize(0.0, np.asarray(g0.q[0]), np.asarray(g0.p[0]),
                  np.asarray(g0.v[0]))

    # stream IMU to t=1.0 and create a factor 0.0 → 1.0
    tm = (np.arange(200) + 0.5) / 200.0
    s = traj.sample(jnp.asarray(tm, jnp.float32))
    for i in range(200):
        io.process_imu(float(tm[i]), np.asarray(s.w_body[i]),
                       np.asarray(s.a_body[i]))
    assert io.process_trigger(1.0)
    sm.run_once()
    assert sm.arena_imu.active.sum() == 1
    assert (0.0, 1.0) in io.model.factor_data

    # a second sensor's trigger lands at t=0.4, inside the factor interval
    assert io.process_trigger(0.4)
    sm.run_once()
    assert sm.arena_imu.active.sum() == 2
    assert (0.0, 0.4) in io.model.factor_data
    assert (0.4, 1.0) in io.model.factor_data
    assert (0.0, 1.0) not in io.model.factor_data
    assert 0.4 in sm.slot_of_stamp

    # the split state must sit on the GT trajectory (solved graph)
    g_mid = traj.sample(jnp.asarray([0.4], jnp.float32))
    st = sm.get_state(0.4)
    assert np.linalg.norm(st["p"] - np.asarray(g_mid.p[0])) < 0.01
    # boundary trigger (exactly an existing stamp) is a no-op split
    assert not io._breakup_constraint(1.0)
