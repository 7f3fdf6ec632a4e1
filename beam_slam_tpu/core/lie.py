"""SO(3)/SE(3) Lie-group math on batched JAX arrays.

TPU-native re-implementation of the subset of ``beam_utils/se3.h`` /
``beam_utils/math.h`` that beam_slam uses (see reference usage in
bs_common/src/bs_common/preintegrator.cpp:35-52 — ``beam::LieAlgebraToR``,
``beam::RightJacobianOfSO3``, ``beam::SkewTransform`` — and
bs_constraints/src/jacobians.cpp).

Conventions:
  * Quaternions are stored ``[w, x, y, z]`` (Hamilton, active rotation),
    matching Eigen's internal ``Quaterniond(w,x,y,z)`` constructor order used
    throughout the reference.
  * All functions are shape-polymorphic over leading batch dims: inputs of
    shape ``(..., 3)`` / ``(..., 4)`` produce outputs with the same leading
    dims. Everything is jit/vmap/grad-safe (no data-dependent control flow;
    small-angle branches are handled with ``jnp.where`` on safe operands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix. (..., 3) -> (..., 3, 3).

    Mirrors ``beam::SkewTransform`` (preintegrator.cpp:44).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# Quaternion algebra ([w, x, y, z])
# ----------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b. (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v. (...,4),(...,3)->(...,3).

    Uses the 15-mul expansion rather than forming the rotation matrix.
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix. (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w,x,y,z]. Branch-free Shepperd.

    (..., 3, 3) -> (..., 4). Safe under jit; picks the numerically best of the
    four Shepperd candidates with jnp.where.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_k^2 values (all >= 0 up to fp error).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS * _EPS))

    # Branch w: q = [t, (m21-m12)/4t', ...] with t' = sqrt(qw2)/2 etc.
    sw = _safe_sqrt(qw2)
    qa = jnp.stack([sw * sw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * sw[..., None])
    sx = _safe_sqrt(qx2)
    qb = jnp.stack([m21 - m12, sx * sx, m01 + m10, m02 + m20], axis=-1) / (2.0 * sx[..., None])
    sy = _safe_sqrt(qy2)
    qc = jnp.stack([m02 - m20, m01 + m10, sy * sy, m12 + m21], axis=-1) / (2.0 * sy[..., None])
    sz = _safe_sqrt(qz2)
    qd = jnp.stack([m10 - m01, m02 + m20, m12 + m21, sz * sz], axis=-1) / (2.0 * sz[..., None])

    vals = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(vals, axis=-1)
    cand = jnp.stack([qa, qb, qc, qd], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


# ----------------------------------------------------------------------------
# SO(3) exp/log and Jacobians
# ----------------------------------------------------------------------------


def so3_exp_quat(w: jnp.ndarray) -> jnp.ndarray:
    """exp: so(3) -> unit quaternion. (..., 3) -> (..., 4).

    Mirrors ``beam::LieAlgebraToR`` (preintegrator.cpp:35) composed with the
    quaternion representation. Taylor-safe near zero.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < _EPS
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48.
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """log: unit quaternion -> so(3) rotation vector. (..., 4) -> (..., 3).

    Mirrors ``beam::RToLieAlgebra`` (inertial_alignment.cpp:156). Returns the
    minimal-angle representative (|axis*angle| <= pi).
    """
    # Canonicalize to w >= 0 for the shortest arc.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(jnp.maximum(vn2, _EPS * _EPS))
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < _EPS
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / vn)
    return k * v


def so3_exp_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """exp: so(3) -> rotation matrix (Rodrigues). (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian J_r of SO(3). (..., 3) -> (..., 3, 3).

    Mirrors ``beam::RightJacobianOfSO3`` (preintegrator.cpp:52):
      J_r(w) = I - b(θ)·[w]× + c(θ)·[w]×²,
      b = (1-cosθ)/θ², c = (θ - sinθ)/θ³.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = skew(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * WW


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l(w) = J_r(-w)."""
    return so3_right_jacobian(-w)


def delta_q(dtheta: jnp.ndarray) -> jnp.ndarray:
    """First-order quaternion increment [1, θ/2] used by the reference IMU
    factor's bias correction (``bs_common::DeltaQ``, cost functor :98)."""
    half = 0.5 * dtheta
    one = jnp.ones_like(half[..., :1])
    return quat_normalize(jnp.concatenate([one, half], axis=-1))


# ----------------------------------------------------------------------------
# SE(3) helpers (4x4 homogeneous transforms)
# ----------------------------------------------------------------------------


def make_transform(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(quat, translation) -> 4x4 transform. Mirrors
    bs_constraints helpers.h ``OrientationAndPositionToTransformationMatrix``."""
    R = quat_to_matrix(q)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=q.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(p)
    return T.at[..., 3, 3].set(1.0)


def invert_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform inverse. Mirrors bs_constraints helpers.h
    ``InvertTransform``."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(-(Rt @ t[..., None])[..., 0])
    return Ti.at[..., 3, 3].set(1.0)


def transform_point(T: jnp.ndarray, pt: jnp.ndarray) -> jnp.ndarray:
    return (T[..., :3, :3] @ pt[..., None])[..., 0] + T[..., :3, 3]


def transform_to_quat_trans(T: jnp.ndarray):
    return matrix_to_quat(T[..., :3, :3]), T[..., :3, 3]


def se3_boxminus_quat(q_a, p_a, q_b, p_b):
    """Minimal 6-dof difference of pose a w.r.t. pose b: [log(q_b⁻¹ q_a), p_a - p_b]."""
    dq = quat_mul(quat_conj(q_b), q_a)
    return jnp.concatenate([so3_log(dq), p_a - p_b], axis=-1)
