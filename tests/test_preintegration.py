"""IMU preintegration tests, mirroring the reference's spline-ground-truth
strategy (bs_models/tests/imu_preintegration_tests.cpp): an analytic C² SE(3)
trajectory provides exact IMU measurements; the scan-based preintegrator must
(a) match a float64 NumPy oracle implementing the reference math literally
(preintegrator.cpp:26-89), and (b) predict the GT end state."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.imu import preintegration as pre
from beam_slam_tpu.utils import sim


# ---------------------------------------------------------------------------
# float64 oracle: literal transcription of the reference Increment math
# ---------------------------------------------------------------------------

def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _right_jac(w):
    th = np.linalg.norm(w)
    W = _skew(w)
    if th < 1e-8:
        return np.eye(3) - 0.5 * W + W @ W / 6.0
    return (np.eye(3) - (1 - np.cos(th)) / th**2 * W
            + (th - np.sin(th)) / th**3 * W @ W)


class OraclePreintegrator:
    def __init__(self, cov_w, cov_a, cov_bg, cov_ba):
        self.cov_w, self.cov_a = cov_w, cov_a
        self.cov_bg, self.cov_ba = cov_bg, cov_ba
        self.q = Rotation.identity()
        self.p = np.zeros(3)
        self.v = np.zeros(3)
        self.t = 0.0
        self.cov = np.zeros((15, 15))
        self.dq_dbg = np.zeros((3, 3))
        self.dp_dbg = np.zeros((3, 3))
        self.dp_dba = np.zeros((3, 3))
        self.dv_dbg = np.zeros((3, 3))
        self.dv_dba = np.zeros((3, 3))

    def increment(self, dt, w_meas, a_meas, bg, ba):
        w = w_meas - bg
        a = a_meas - ba
        q_full = Rotation.from_rotvec(w * dt)
        q_half = Rotation.from_rotvec(0.5 * w * dt)
        Rq = self.q.as_matrix()

        A = np.eye(9)
        A[0:3, 0:3] = q_full.as_matrix().T
        A[6:9, 0:3] = -dt * Rq @ _skew(a)
        A[3:6, 0:3] = -0.5 * dt * dt * Rq @ _skew(a)
        A[3:6, 6:9] = dt * np.eye(3)
        B = np.zeros((9, 6))
        B[0:3, 0:3] = dt * _right_jac(w * dt)
        B[6:9, 3:6] = dt * Rq
        B[3:6, 3:6] = 0.5 * dt * dt * Rq
        Qw = np.zeros((6, 6))
        Qw[0:3, 0:3] = self.cov_w / max(dt, 1e-7)
        Qw[3:6, 3:6] = self.cov_a / max(dt, 1e-7)
        self.cov[0:9, 0:9] = A @ self.cov[0:9, 0:9] @ A.T + B @ Qw @ B.T
        self.cov[9:12, 9:12] += self.cov_bg * dt
        self.cov[12:15, 12:15] += self.cov_ba * dt

        self.dp_dbg += dt * self.dv_dbg - 0.5 * dt * dt * Rq @ _skew(a) @ self.dq_dbg
        self.dp_dba += dt * self.dv_dba - 0.5 * dt * dt * Rq
        self.dv_dbg += -dt * Rq @ _skew(a) @ self.dq_dbg
        self.dv_dba += -dt * Rq
        self.dq_dbg = q_full.as_matrix().T @ self.dq_dbg - dt * _right_jac(w * dt)

        q_mid = self.q * q_half
        a_mid = q_mid.apply(a)
        self.t += dt
        self.p = self.p + dt * self.v + 0.5 * dt * dt * a_mid
        self.v = self.v + dt * a_mid
        self.q = self.q * q_full


def _run_both(n=200, rate=200.0, bg=None, ba=None, seed=3):
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory()
    s = sim.imu_measurements(traj, 0.0, n / rate, rate)
    w = np.asarray(s.w_body, np.float64)
    a = np.asarray(s.a_body, np.float64)
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba
    noise = pre.PreintNoise.isotropic(1e-3, 1e-2, 1e-5, 1e-4)

    oracle = OraclePreintegrator(
        np.asarray(noise.cov_w, np.float64), np.asarray(noise.cov_a, np.float64),
        np.asarray(noise.cov_bg, np.float64), np.asarray(noise.cov_ba, np.float64))
    dt = 1.0 / rate
    for i in range(len(w) - 1):
        oracle.increment(dt, w[i], a[i], bg, ba)

    dts = jnp.full((len(w) - 1,), dt, jnp.float32)
    delta = pre.preintegrate(dts, s.w_body[:-1], s.a_body[:-1],
                             jnp.asarray(bg, jnp.float32),
                             jnp.asarray(ba, jnp.float32), noise)
    return oracle, delta, s


def test_matches_f64_oracle():
    oracle, delta, _ = _run_both()
    q_o = oracle.q.as_quat()  # xyzw
    q_o = np.concatenate([q_o[3:4], q_o[:3]])
    q_j = np.asarray(delta.q)
    assert abs(abs(np.dot(q_o, q_j)) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(delta.p), oracle.p, atol=1e-4)
    np.testing.assert_allclose(np.asarray(delta.v), oracle.v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(delta.t), oracle.t, atol=1e-6)
    # bias jacobians
    np.testing.assert_allclose(np.asarray(delta.dq_dbg), oracle.dq_dbg,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(delta.dv_dba), oracle.dv_dba,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(delta.dp_dbg), oracle.dp_dbg,
                               rtol=2e-3, atol=1e-4)
    # covariance: relative Frobenius error
    c_j, c_o = np.asarray(delta.cov, np.float64), oracle.cov
    assert np.linalg.norm(c_j - c_o) / np.linalg.norm(c_o) < 1e-3


def test_nonzero_bias_linearization():
    bg = np.array([0.02, -0.01, 0.015])
    ba = np.array([0.1, -0.05, 0.08])
    oracle, delta, _ = _run_both(bg=bg, ba=ba)
    np.testing.assert_allclose(np.asarray(delta.p), oracle.p, atol=1e-4)
    np.testing.assert_allclose(np.asarray(delta.dp_dba), oracle.dp_dba,
                               rtol=2e-3, atol=1e-4)


def test_predict_state_recovers_ground_truth():
    """Zero-noise preintegration propagated from the GT start state must land
    on the GT end state (reference BaseFunctionality test pattern,
    imu_preintegration_tests.cpp:532).

    Measurements are sampled at interval midpoints so the zero-order-hold
    sampling is 2nd-order consistent with the midpoint integrator (the
    f64-oracle test above covers the production sample-and-hold path)."""
    rate, T = 200.0, 2.0
    traj = sim.AnalyticTrajectory()
    n = int(T * rate)
    dt = 1.0 / rate
    t_edges = jnp.arange(n + 1, dtype=jnp.float32) * dt
    t_mid = t_edges[:-1] + 0.5 * dt
    s_mid = traj.sample(t_mid)
    s = traj.sample(t_edges)
    noise = pre.PreintNoise.isotropic(1e-3, 1e-2, 1e-5, 1e-4)
    delta = pre.preintegrate(jnp.full((n,), dt, jnp.float32),
                             s_mid.w_body, s_mid.a_body,
                             jnp.zeros(3), jnp.zeros(3), noise)
    q_j, p_j, v_j = pre.predict_state(
        delta, s.q[0], s.p[0], s.v[0])
    np.testing.assert_allclose(np.asarray(p_j), np.asarray(s.p[-1]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_j), np.asarray(s.v[-1]), atol=2e-3)
    dq = lie.quat_mul(lie.quat_conj(q_j), s.q[-1])
    assert np.linalg.norm(np.asarray(lie.so3_log(dq))) < 1e-3


def test_masked_samples_ignored():
    """Invalid samples (mask/dt<=0) must not change the result — the fixed
    capacity buffer semantics."""
    _, delta_ref, s = _run_both(n=100)
    n = len(np.asarray(s.t))
    dts = np.full((n - 1,), 1.0 / 200.0, np.float32)
    pad_dt = np.concatenate([dts, np.zeros(50, np.float32)])
    pad_w = np.concatenate([np.asarray(s.w_body[:-1]),
                            np.full((50, 3), 99.0, np.float32)])
    pad_a = np.concatenate([np.asarray(s.a_body[:-1]),
                            np.full((50, 3), 99.0, np.float32)])
    noise = pre.PreintNoise.isotropic(1e-3, 1e-2, 1e-5, 1e-4)
    delta = pre.preintegrate(jnp.asarray(pad_dt), jnp.asarray(pad_w),
                             jnp.asarray(pad_a), jnp.zeros(3), jnp.zeros(3),
                             noise)
    np.testing.assert_allclose(np.asarray(delta.p), np.asarray(delta_ref.p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(delta.cov), np.asarray(delta_ref.cov),
                               atol=1e-9)


def test_sqrt_inv_cov_whitens():
    _, delta, _ = _run_both(n=150)
    A = np.asarray(delta.sqrt_inv_cov, np.float64)
    cov = np.asarray(delta.cov, np.float64)
    err = A.T @ A @ cov - np.eye(15)
    assert np.abs(err).max() < 5e-2  # f32 factorization vs f64 product


def test_sqrt_inv_cov_degenerate_floor():
    """Zero covariance must hit the cov_tol/bias_cov_tol floors and stay
    finite (preintegrator.cpp:121-133)."""
    A = np.asarray(pre.sqrt_inv_cov(jnp.zeros((15, 15), jnp.float32)))
    assert np.all(np.isfinite(A))
    # floor: cov = tol·I → A ≈ I/sqrt(tol)
    np.testing.assert_allclose(A[0, 0], 1.0 / np.sqrt(pre.COV_TOL), rtol=1e-3)
