"""Unit tests for the Lie-group substrate — mirrors the reference's
analytic-vs-numeric Jacobian style (bs_constraints/tests/
jacobian_helper_tests.cpp:15-394)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import lie


def random_rotvec(rng, n=64, scale=2.5):
    return rng.standard_normal((n, 3)) * scale


def test_exp_quat_matches_scipy(rng):
    w = random_rotvec(rng).astype(np.float32)
    q = np.asarray(lie.so3_exp_quat(jnp.asarray(w)))
    q_scipy = Rotation.from_rotvec(w).as_quat()  # xyzw
    q_ref = np.concatenate([q_scipy[:, 3:4], q_scipy[:, :3]], axis=1)
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(q * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)


def test_exp_log_roundtrip(rng):
    # small angles: literal round-trip (|w| < pi)
    w = (random_rotvec(rng, scale=0.5)).astype(np.float32)
    w = np.clip(w, -1.0, 1.0)
    w_back = np.asarray(lie.so3_log(lie.so3_exp_quat(jnp.asarray(w))))
    np.testing.assert_allclose(w_back, w, atol=2e-5)
    # large angles: log returns the minimal representative — same rotation
    w_big = random_rotvec(rng, scale=3.0).astype(np.float32)
    q1 = lie.so3_exp_quat(jnp.asarray(w_big))
    q2 = lie.so3_exp_quat(lie.so3_log(q1))
    dot = np.abs(np.sum(np.asarray(q1) * np.asarray(q2), axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    # and its magnitude is within [0, pi]
    norms = np.linalg.norm(np.asarray(lie.so3_log(q1)), axis=1)
    assert norms.max() <= np.pi + 1e-5


def test_exp_log_small_angle():
    w = jnp.asarray([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]], jnp.float32)
    q = lie.so3_exp_quat(w)
    assert np.all(np.isfinite(np.asarray(q)))
    w_back = lie.so3_log(q)
    np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=1e-7)
    # gradients must be finite through the small-angle branch
    g = jax.grad(lambda x: jnp.sum(lie.so3_log(lie.so3_exp_quat(x))))(w[0])
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_mul_matches_matrix_product(rng):
    a = np.asarray(lie.so3_exp_quat(jnp.asarray(random_rotvec(rng, 8), jnp.float32)))
    b = np.asarray(lie.so3_exp_quat(jnp.asarray(random_rotvec(rng, 8), jnp.float32)))
    q_ab = lie.quat_mul(jnp.asarray(a), jnp.asarray(b))
    R_ab = np.asarray(lie.quat_to_matrix(q_ab))
    R_ref = np.asarray(lie.quat_to_matrix(jnp.asarray(a))) @ np.asarray(
        lie.quat_to_matrix(jnp.asarray(b)))
    np.testing.assert_allclose(R_ab, R_ref, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = lie.so3_exp_quat(jnp.asarray(random_rotvec(rng, 16), jnp.float32))
    v = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    rv = np.asarray(lie.quat_rotate(q, v))
    Rv = np.einsum("nij,nj->ni", np.asarray(lie.quat_to_matrix(q)), np.asarray(v))
    np.testing.assert_allclose(rv, Rv, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    # include near-pi rotations to hit all Shepperd branches
    w = np.concatenate([
        random_rotvec(rng, 32, scale=3.1),
        np.array([[3.14, 0, 0], [0, 3.14, 0], [0, 0, 3.14], [0, 0, 0]]),
    ]).astype(np.float32)
    q = lie.so3_exp_quat(jnp.asarray(w))
    R = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(R)
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_right_jacobian_finite_difference(rng):
    """J_r validates exp(w + J_r(w)·dw) ≈ exp(w)·exp(dw) to first order."""
    w = jnp.asarray(random_rotvec(rng, 8, scale=1.5), jnp.float32)
    Jr = np.asarray(lie.so3_right_jacobian(w))
    eps = 1e-3
    for k in range(3):
        dw = np.zeros(3, np.float32)
        dw[k] = eps
        lhs = lie.so3_log(
            lie.quat_mul(lie.quat_conj(lie.so3_exp_quat(w)),
                         lie.so3_exp_quat(w + jnp.asarray(dw))))
        np.testing.assert_allclose(np.asarray(lhs), Jr[:, :, k] * eps,
                                   atol=2e-4)


def test_skew_cross(rng):
    a = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray((lie.skew(a) @ b[..., None])[..., 0]),
        np.asarray(jnp.cross(a, b)), atol=1e-6)


def test_transform_ops(rng):
    q = lie.so3_exp_quat(jnp.asarray(random_rotvec(rng, 4), jnp.float32))
    p = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    T = lie.make_transform(q, p)
    Ti = lie.invert_transform(T)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (4, 4, 4))
    np.testing.assert_allclose(np.asarray(T @ Ti), eye, atol=1e-5)
    pt = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lie.transform_point(T, pt)),
        np.asarray(lie.quat_rotate(q, pt) + p), atol=1e-5)
    q2, p2 = lie.transform_to_quat_trans(T)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-6)
    dot = np.abs(np.sum(np.asarray(q2) * np.asarray(q), axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
