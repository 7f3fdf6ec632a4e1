"""Exact vs pseudo marginalization.

Exact marginalization must preserve the information of the dropped states:
after marginalizing the head of a chain, the remaining states' optimum must
match the full-graph optimum (for the near-linear regime this holds to
first order). Pseudo-marginalization replaces it with a window-start prior
— cheaper, slightly lossy (the reference's real-time default)."""

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
RATE = 200.0


def preint_segment(traj, t0, t1):
    n = int(round((t1 - t0) * RATE))
    dt = (t1 - t0) / n
    t_mid = t0 + (jnp.arange(n, dtype=jnp.float32) + 0.5) * dt
    s = traj.sample(t_mid)
    return pre.preintegrate(jnp.full((n,), dt, jnp.float32), s.w_body,
                            s.a_body, jnp.zeros(3), jnp.zeros(3), NOISE)


def run_chain(pseudo: bool, lag: float, total_s: float = 6.0,
              kf_dt: float = 0.5, perturb: float = 0.05, seed: int = 3):
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory()
    cfg = SmootherConfig(
        lag_duration=lag, pseudo_marginalization=pseudo, max_states=24,
        max_imu_factors=48, max_prior_factors=8, max_rel_pose_factors=8,
        max_abs_pose_factors=8, max_gravity_factors=8, max_motion_factors=8,
        solver=gn.SolverOptions(max_iterations=10))
    sm = FixedLagSmoother(cfg)
    times = np.arange(0.0, total_s + 1e-9, kf_dt)
    gt = traj.sample(jnp.asarray(times, jnp.float32))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, gt.q[0], gt.p[0], gt.v[0])
    txn.add_imu_prior(0.0, gt.q[0], gt.p[0], gt.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    for i in range(1, len(times)):
        t0, t1 = float(times[i - 1]), float(times[i])
        d = preint_segment(traj, t0, t1)
        txn = Transaction(stamp=t1)
        txn.add_imu_state(
            t1,
            np.asarray(lie.quat_mul(gt.q[i], lie.so3_exp_quat(jnp.asarray(
                rng.standard_normal(3).astype(np.float32) * perturb)))),
            np.asarray(gt.p[i]) + rng.standard_normal(3) * perturb,
            np.asarray(gt.v[i]) + rng.standard_normal(3) * perturb)
        txn.add_imu_relative(t0, t1, d, np.zeros(3), np.zeros(3))
        sm.send_transaction(txn)
        sm.run_once()
    return sm, gt, times


def test_exact_marginalization_preserves_estimates():
    # reference answer: huge lag (nothing marginalized)
    sm_full, gt, times = run_chain(pseudo=True, lag=100.0)
    sm_exact, _, _ = run_chain(pseudo=False, lag=2.0)
    # marginalization happened and marginal priors exist
    assert len(sm_exact.current_stamps()) < len(sm_full.current_stamps())
    assert sm_exact.arena_marg.active.sum() >= 1
    # shared (in-window) stamps agree with the full-graph answer
    for t in sm_exact.current_stamps():
        a = sm_exact.get_state(t)
        b = sm_full.get_state(t)
        assert np.linalg.norm(a["p"] - b["p"]) < 5e-3, t
        assert np.linalg.norm(a["v"] - b["v"]) < 5e-3, t


def test_exact_vs_pseudo_both_track_gt():
    idx_of = None
    for pseudo in (True, False):
        sm, gt, times = run_chain(pseudo=pseudo, lag=2.0)
        idx_of = {float(t): i for i, t in enumerate(times)}
        errs = []
        for t in sm.current_stamps():
            st = sm.get_state(t)
            errs.append(np.linalg.norm(st["p"] - np.asarray(
                gt.p[idx_of[t]])))
        assert np.asarray(errs).max() < 0.02, (pseudo, errs)


def test_exact_marginalization_window_bounded():
    sm, gt, times = run_chain(pseudo=False, lag=1.5, total_s=5.0)
    stamps = sm.current_stamps()
    assert min(stamps) >= 5.0 - 1.5 - 1e-6
    # marginal factors never reference inactive slots
    a = sm.arena_marg
    for i in a.active_indices():
        for b in range(a.slots.shape[1]):
            assert sm.state_active[a.slots[i, b]]


def run_star(pseudo: bool, n: int = 7, lag: float = 2.0, seed: int = 5):
    """Chain + star topology: state 0 has relative-pose factors to states
    1..n-1, so marginalizing it leaves n-1 > 4 connected remaining states —
    exercises the lifted MARGINAL_MAX_BLOCKS (old cap: 4)."""
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory()
    cfg = SmootherConfig(
        lag_duration=lag, pseudo_marginalization=pseudo, max_states=16,
        max_imu_factors=32, max_prior_factors=8, max_rel_pose_factors=16,
        max_abs_pose_factors=8, max_gravity_factors=8, max_motion_factors=8,
        solver=gn.SolverOptions(max_iterations=10))
    sm = FixedLagSmoother(cfg)
    times = np.arange(0.0, 0.5 * n + 1e-9, 0.5)
    gt = traj.sample(jnp.asarray(times, jnp.float32))
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, gt.q[0], gt.p[0], gt.v[0])
    txn.add_imu_prior(0.0, gt.q[0], gt.p[0], gt.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    max_width = 0
    for i in range(1, len(times)):
        t0, t1 = float(times[i - 1]), float(times[i])
        d = preint_segment(traj, t0, t1)
        txn = Transaction(stamp=t1)
        txn.add_imu_state(
            t1,
            np.asarray(lie.quat_mul(gt.q[i], lie.so3_exp_quat(jnp.asarray(
                rng.standard_normal(3).astype(np.float32) * 0.03)))),
            np.asarray(gt.p[i]) + rng.standard_normal(3) * 0.03,
            np.asarray(gt.v[i]) + rng.standard_normal(3) * 0.03)
        txn.add_imu_relative(t0, t1, d, np.zeros(3), np.zeros(3))
        # star edge 0 → i (ground-truth relative pose, baselink frame)
        dq = lie.quat_mul(lie.quat_conj(gt.q[0]), gt.q[i])
        dp = lie.quat_rotate(lie.quat_conj(gt.q[0]), gt.p[i] - gt.p[0])
        txn.add_relative_pose(0.0, t1, np.asarray(dq), np.asarray(dp),
                              1e2 * np.eye(6, dtype=np.float32))
        sm.send_transaction(txn)
        sm.run_once()
        a = sm.arena_marg
        for k in a.active_indices():
            max_width = max(max_width, len(set(a.slots[k])))
    return sm, gt, times, max_width


def test_exact_marginalization_wide_connectivity():
    """Marginalizing a state connected to >4 remaining states must stay
    exact (no pseudo fallback) and match the full-graph optimum
    (fuse_constraints::marginalizeVariables has no block cap)."""
    sm_full, gt, times, _ = run_star(pseudo=True, lag=100.0)
    sm_exact, _, _, max_width = run_star(pseudo=False, lag=2.0)
    assert sm_exact.arena_marg.active.sum() >= 1
    assert max_width > 4, max_width  # the old cap would have fallen back
    for t in sm_exact.current_stamps():
        pa = sm_exact.get_state(t)["p"]
        pb = sm_full.get_state(t)["p"]
        assert np.linalg.norm(pa - pb) < 5e-3, t


def run_visual(pseudo: bool, lag: float, seed: int = 7):
    """VIO-style: landmarks observed by overlapping frame runs; expiring
    frames must carry their visual information into the marginal prior
    (landmarks of expired frames eliminated, not dropped)."""
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory()
    cfg = SmootherConfig(
        lag_duration=lag, pseudo_marginalization=pseudo, max_states=16,
        max_landmarks=16, max_imu_factors=32, max_prior_factors=8,
        max_rel_pose_factors=8, max_abs_pose_factors=8,
        max_gravity_factors=8, max_motion_factors=8,
        max_reprojection_factors=64, max_idp_factors=4,
        solver=gn.SolverOptions(max_iterations=10))
    sm = FixedLagSmoother(cfg)
    intr = np.asarray([400.0, 400.0, 320.0, 240.0], np.float32)
    times = np.arange(0.0, 4.0 + 1e-9, 0.5)
    gt = traj.sample(jnp.asarray(times, jnp.float32))

    def project(i, X):
        Xc = np.asarray(lie.quat_rotate(
            lie.quat_conj(gt.q[i]), jnp.asarray(X - np.asarray(gt.p[i]),
                                                jnp.float32)))
        return np.array([intr[0] * Xc[0] / Xc[2] + intr[2],
                         intr[1] * Xc[1] / Xc[2] + intr[3]], np.float32)

    # landmarks in front of the early trajectory, each seen by 4 frames
    lms = {j: np.asarray(gt.p[j]) + np.array([0.5, 0.3, 6.0]) * (1 + 0.1*j)
           for j in range(len(times) - 3)}
    txn = Transaction(stamp=0.0)
    txn.add_imu_state(0.0, gt.q[0], gt.p[0], gt.v[0])
    txn.add_imu_prior(0.0, gt.q[0], gt.p[0], gt.v[0], np.zeros(3),
                      np.zeros(3), 1e3 * np.eye(15, dtype=np.float32))
    sm.send_transaction(txn)
    sm.run_once()
    for i in range(1, len(times)):
        t0, t1 = float(times[i - 1]), float(times[i])
        d = preint_segment(traj, t0, t1)
        txn = Transaction(stamp=t1)
        txn.add_imu_state(
            t1,
            np.asarray(lie.quat_mul(gt.q[i], lie.so3_exp_quat(jnp.asarray(
                rng.standard_normal(3).astype(np.float32) * 0.03)))),
            np.asarray(gt.p[i]) + rng.standard_normal(3) * 0.03,
            np.asarray(gt.v[i]) + rng.standard_normal(3) * 0.03)
        txn.add_imu_relative(t0, t1, d, np.zeros(3), np.zeros(3))
        for j, X in lms.items():
            if j <= i < j + 4:   # observation window of landmark j
                if not sm.has_landmark(j) and j == i:
                    txn.add_landmark(j, X + rng.standard_normal(3) * 0.05)
                if sm.has_landmark(j) or j == i:
                    txn.add_reprojection(t1, j, project(i, X), intr,
                                         np.eye(2, dtype=np.float32))
        sm.send_transaction(txn)
        sm.run_once()
    return sm, gt, times


def test_exact_marginalization_eliminates_landmarks():
    sm_full, gt, times = run_visual(pseudo=True, lag=100.0)
    sm_exact, _, _ = run_visual(pseudo=False, lag=1.5)
    # marginalization ran and produced marginal priors
    assert sm_exact.arena_marg.active.sum() >= 1
    # landmarks anchored on expired frames are gone from the store
    assert int(sm_exact.lm_active.sum()) < int(sm_full.lm_active.sum())
    for t in sm_exact.current_stamps():
        pa = sm_exact.get_state(t)["p"]
        pb = sm_full.get_state(t)["p"]
        assert np.linalg.norm(pa - pb) < 8e-3, (t, np.linalg.norm(pa - pb))
