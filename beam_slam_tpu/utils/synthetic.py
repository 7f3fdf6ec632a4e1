"""Synthetic sliding-window problem builder — flagship workload used by
``bench.py``, ``__graft_entry__.py`` and the multi-chip tests.

Builds an LVIO-shaped window (SURVEY.md §6: 10 s lag, keyframes from
lidar/visual odometry + preintegrated IMU chain): K IMU states connected by
preintegrated IMU factors, relative-pose (lidar-odometry-like) factors with a
sensor extrinsic, a window-start prior — all constructed batched (vmap'd
preintegration over segments), no per-factor host loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import factors as fc
from beam_slam_tpu.core import lie
from beam_slam_tpu.core.window import WindowState
from beam_slam_tpu.imu import preintegration as pre
from beam_slam_tpu.utils import sim


def build_lvio_window(key: jax.Array, n_kf: int = 32, kf_dt: float = 0.25,
                      K: Optional[int] = None, rate_hz: float = 200.0,
                      perturb: float = 0.05, with_rel_pose: bool = True,
                      with_vision: bool = False, n_landmarks: int = 256,
                      obs_per_lm: int = 8, n_idp: int = 0,
                      dtype=jnp.float32) -> Tuple[WindowState, Tuple, Tuple]:
    """Returns (window, families, losses) for one synthetic LVIO window.

    With ``with_vision`` the window carries the full visual-inertial BA
    problem of an LVIO tick (the reference's headline workload — "real time,
    full visual-inertial bundle adjustment", /root/reference/README.md:46):
    ``n_landmarks`` Euclidean landmarks each observed from ``obs_per_lm``
    consecutive keyframes through a camera extrinsic (→ n_landmarks·obs_per_lm
    ReprojectionFactors, Schur-eliminated in the solver) plus ``n_idp``
    inverse-depth landmarks with binary anchor→measurement factors
    (bs_constraints/visual/inversedepth_reprojection_functor.h).
    """
    K = K or n_kf
    assert K >= n_kf
    traj = sim.AnalyticTrajectory(dtype=dtype)
    kf_t = jnp.arange(n_kf, dtype=dtype) * kf_dt
    gt = traj.sample(kf_t)

    # ---- perturbed initial states (state 0 pinned by the prior)
    k1, k2, k3 = jax.random.split(key, 3)
    dth = perturb * jax.random.normal(k1, (n_kf, 3), dtype)
    dp = perturb * jax.random.normal(k2, (n_kf, 3), dtype)
    dv = perturb * jax.random.normal(k3, (n_kf, 3), dtype)
    keep0 = jnp.arange(n_kf)[:, None] > 0
    q0 = lie.quat_mul(gt.q, lie.so3_exp_quat(jnp.where(keep0, dth, 0)))
    p0 = gt.p + jnp.where(keep0, dp, 0)
    v0 = gt.v + jnp.where(keep0, dv, 0)

    L_cap = (n_landmarks + n_idp) if with_vision else 0
    window = WindowState.zeros(K, E=3, L=L_cap, dtype=dtype)
    window = window.replace(imu=window.imu.replace(
        q=window.imu.q.at[:n_kf].set(q0),
        p=window.imu.p.at[:n_kf].set(p0),
        v=window.imu.v.at[:n_kf].set(v0),
        active=window.imu.active.at[:n_kf].set(True)))

    # ---- preintegrated IMU chain (vmap over segments, midpoint sampling)
    n_samp = int(round(kf_dt * rate_hz))
    dt = kf_dt / n_samp
    seg_t0 = kf_t[:-1]
    t_mid = seg_t0[:, None] + (jnp.arange(n_samp, dtype=dtype)[None, :] + 0.5) * dt
    meas = jax.vmap(traj.sample)(t_mid)  # leaves [S, n_samp, ...]
    noise = pre.PreintNoise.isotropic(1e-4, 1e-3, 1e-6, 1e-5, dtype)
    dts = jnp.full((n_kf - 1, n_samp), dt, dtype)
    deltas = jax.vmap(
        lambda d, w, a: pre.preintegrate(d, w, a, jnp.zeros(3, dtype),
                                         jnp.zeros(3, dtype), noise)
    )(dts, meas.w_body, meas.a_body)

    S = n_kf - 1
    rel = fc.ImuRelativeFactors.zeros(K, dtype)
    idx = jnp.arange(S)
    rel = rel.replace(
        slots=rel.slots.at[:S].set(jnp.stack([idx, idx + 1], axis=1)
                                   .astype(jnp.int32)),
        active=rel.active.at[:S].set(True),
        dt=rel.dt.at[:S].set(deltas.t), dq=rel.dq.at[:S].set(deltas.q),
        dp=rel.dp.at[:S].set(deltas.p), dv=rel.dv.at[:S].set(deltas.v),
        dq_dbg=rel.dq_dbg.at[:S].set(deltas.dq_dbg),
        dp_dbg=rel.dp_dbg.at[:S].set(deltas.dp_dbg),
        dp_dba=rel.dp_dba.at[:S].set(deltas.dp_dba),
        dv_dbg=rel.dv_dbg.at[:S].set(deltas.dv_dbg),
        dv_dba=rel.dv_dba.at[:S].set(deltas.dv_dba),
        sqrt_info=rel.sqrt_info.at[:S].set(deltas.sqrt_inv_cov))

    prior = fc.ImuPriorFactors.zeros(2, dtype)
    prior = prior.replace(
        active=prior.active.at[0].set(True),
        q0=prior.q0.at[0].set(gt.q[0]), p0=prior.p0.at[0].set(gt.p[0]),
        v0=prior.v0.at[0].set(gt.v[0]),
        sqrt_info=prior.sqrt_info.at[0].set(1e3 * jnp.eye(15, dtype=dtype)))

    families = [rel, prior]
    losses = [None, None]

    if with_rel_pose:
        # lidar-odometry-like relative pose factors in a sensor frame
        q_e = lie.so3_exp_quat(jnp.asarray([0.1, -0.2, 0.3], dtype))
        p_e = jnp.asarray([0.2, 0.1, -0.3], dtype)
        window = window.replace(extrinsics=window.extrinsics.replace(
            q=window.extrinsics.q.at[1].set(q_e),
            p=window.extrinsics.p.at[1].set(p_e),
            active=window.extrinsics.active.at[1].set(True),
            held=window.extrinsics.held.at[1].set(True)))
        q_ws = lie.quat_mul(gt.q, q_e[None, :])
        p_ws = gt.p + lie.quat_rotate(gt.q, p_e[None, :])
        dq = lie.quat_mul(lie.quat_conj(q_ws[:-1]), q_ws[1:])
        dpm = lie.quat_rotate(lie.quat_conj(q_ws[:-1]), p_ws[1:] - p_ws[:-1])
        rp = fc.RelativePoseFactors.zeros(K, dtype)
        rp = rp.replace(
            slots=rp.slots.at[:S].set(
                jnp.stack([idx, idx + 1, jnp.ones_like(idx)], axis=1)
                .astype(jnp.int32)),
            active=rp.active.at[:S].set(True),
            dq=rp.dq.at[:S].set(dq), dp=rp.dp.at[:S].set(dpm),
            sqrt_info=rp.sqrt_info.at[:S].set(
                jnp.tile(1e2 * jnp.eye(6, dtype=dtype), (S, 1, 1))))
        families.append(rp)
        losses.append(1.0)  # Cauchy, as the reference attaches to lidar factors

    if with_vision:
        window, vis_families, vis_losses = _add_vision(
            key, window, gt, n_kf, n_landmarks, obs_per_lm, n_idp, perturb,
            dtype)
        families.extend(vis_families)
        losses.extend(vis_losses)

    return window, tuple(families), tuple(losses)


# Camera model used by the synthetic vision problem (pinhole, reference-style
# intrinsics scale: beam_slam_launch/config/calibration_params.yaml camera).
_INTR = (500.0, 500.0, 320.0, 240.0)
_PIX_SIGMA = 1.0


def _add_vision(key, window: WindowState, gt, n_kf: int, n_lm: int,
                obs_per_lm: int, n_idp: int, perturb: float, dtype):
    """Build the visual-BA factor families over the GT trajectory.

    Camera extrinsic lives in Poses slot 2 (held — the fixed-calibration
    functor case; flip ``held`` for the online-calib variant). Each landmark
    is parked in front of the camera of the midpoint keyframe of its
    observation run, so all its observations have positive depth.
    """
    k_lm, k_px, k_pert, k_idp, k_rho = jax.random.split(key, 5)
    fx, fy, cx, cy = _INTR
    intr = jnp.asarray(_INTR, dtype)

    # camera extrinsic (baselink→camera), held
    q_bc = lie.so3_exp_quat(jnp.asarray([0.02, -0.01, 0.03], dtype))
    p_bc = jnp.asarray([0.1, 0.0, 0.05], dtype)
    window = window.replace(extrinsics=window.extrinsics.replace(
        q=window.extrinsics.q.at[2].set(q_bc),
        p=window.extrinsics.p.at[2].set(p_bc),
        active=window.extrinsics.active.at[2].set(True),
        held=window.extrinsics.held.at[2].set(True)))

    # GT camera poses per keyframe
    q_wc = lie.quat_mul(gt.q, q_bc[None, :])
    p_wc = gt.p + lie.quat_rotate(gt.q, p_bc[None, :])

    span = max(n_kf - obs_per_lm, 1)

    def make_landmarks(k_place, n, anchor0):
        """anchor keyframes + world positions for n landmarks."""
        idx = jnp.arange(n)
        a = (idx * span // max(n - 1, 1)).astype(jnp.int32)
        mid = jnp.clip(a + obs_per_lm // 2, 0, n_kf - 1)
        u1, u2, u3 = jax.random.split(k_place, 3)
        xn = jax.random.uniform(u1, (n,), dtype, -0.45, 0.45)
        yn = jax.random.uniform(u2, (n,), dtype, -0.35, 0.35)
        z = jax.random.uniform(u3, (n,), dtype, 4.0, 12.0)
        X_c = jnp.stack([xn * z, yn * z, z], axis=1)
        ref = a if anchor0 else mid
        X_w = lie.quat_rotate(q_wc[ref], X_c) + p_wc[ref]
        return a, X_w

    def project(X_w, kf):
        """pixel of world point X_w in keyframe kf's GT camera."""
        X_c = lie.quat_rotate(lie.quat_conj(q_wc[kf]), X_w - p_wc[kf])
        z = jnp.maximum(X_c[..., 2], 1e-3)
        return jnp.stack([fx * X_c[..., 0] / z + cx,
                          fy * X_c[..., 1] / z + cy], axis=-1)

    families, losses = [], []

    # ---- Euclidean landmarks → ReprojectionFactors
    a_lm, X_w = make_landmarks(k_lm, n_lm, anchor0=False)
    obs_kf = (a_lm[:, None]
              + jnp.arange(obs_per_lm, dtype=jnp.int32)[None, :])  # [n_lm, O]
    pix = jax.vmap(lambda X, kfs: project(X[None, :], kfs))(X_w, obs_kf)
    pix = pix + _PIX_SIGMA * jax.random.normal(k_px, pix.shape, dtype)

    F = n_lm * obs_per_lm
    lm_slot = jnp.repeat(jnp.arange(n_lm, dtype=jnp.int32), obs_per_lm)
    kf_slot = obs_kf.reshape(-1)
    reproj = fc.ReprojectionFactors.zeros(F, dtype)
    reproj = reproj.replace(
        slots=jnp.stack([kf_slot, jnp.full((F,), 2, jnp.int32), lm_slot],
                        axis=1),
        active=jnp.ones((F,), bool),
        pixel=pix.reshape(F, 2),
        intr=jnp.tile(intr, (F, 1)),
        sqrt_info=jnp.tile((1.0 / _PIX_SIGMA) * jnp.eye(2, dtype=dtype),
                           (F, 1, 1)))
    families.append(reproj)
    losses.append(2.0)  # Cauchy on visual factors, as the reference VO

    # perturbed initial landmark estimates (GT + noise)
    X0 = X_w + 2.0 * perturb * jax.random.normal(k_pert, X_w.shape, dtype)
    lm = window.landmarks
    lm = lm.replace(pt=lm.pt.at[:n_lm].set(X0),
                    active=lm.active.at[:n_lm].set(True))

    # ---- inverse-depth landmarks → binary anchor/measurement factors
    if n_idp > 0:
        a_idp, X_idp = make_landmarks(k_idp, n_idp, anchor0=True)
        # bearing in the anchor camera: (mx, my) of X/z
        X_ca = jax.vmap(lambda X, a: lie.quat_rotate(
            lie.quat_conj(q_wc[a]), X - p_wc[a]))(X_idp, a_idp)
        rho_gt = 1.0 / jnp.maximum(X_ca[:, 2], 1e-3)
        bearing = X_ca[:, :2] * rho_gt[:, None]
        O = obs_per_lm - 1  # measurements exclude the anchor frame
        meas_kf = (a_idp[:, None]
                   + 1 + jnp.arange(O, dtype=jnp.int32)[None, :])
        pix_i = jax.vmap(lambda X, kfs: project(X[None, :], kfs))(X_idp,
                                                                  meas_kf)
        pix_i = pix_i + _PIX_SIGMA * jax.random.normal(k_rho, pix_i.shape,
                                                       dtype)
        Fi = n_idp * O
        idp_slot = (n_lm + jnp.repeat(jnp.arange(n_idp, dtype=jnp.int32), O))
        idp = fc.InverseDepthReprojectionFactors.zeros(Fi, dtype)
        idp = idp.replace(
            slots=jnp.stack([jnp.repeat(a_idp, O), meas_kf.reshape(-1),
                             jnp.full((Fi,), 2, jnp.int32), idp_slot], axis=1),
            active=jnp.ones((Fi,), bool),
            bearing=jnp.repeat(bearing, O, axis=0),
            pixel=pix_i.reshape(Fi, 2),
            intr=jnp.tile(intr, (Fi, 1)),
            sqrt_info=jnp.tile((1.0 / _PIX_SIGMA) * jnp.eye(2, dtype=dtype),
                               (Fi, 1, 1)))
        families.append(idp)
        losses.append(2.0)
        # initial ρ perturbed ~10%
        rho0 = rho_gt * (1.0 + 0.1 * jax.random.normal(k_rho, (n_idp,), dtype))
        idp_pts = jnp.concatenate(
            [rho0[:, None], jnp.zeros((n_idp, 2), dtype)], axis=1)
        lm = lm.replace(pt=lm.pt.at[n_lm:n_lm + n_idp].set(idp_pts),
                        active=lm.active.at[n_lm:n_lm + n_idp].set(True))

    window = window.replace(landmarks=lm)
    return window, families, losses


def build_lvio_batch(key: jax.Array, batch: int, **kw):
    """Batch of independent windows (leading axis = submap), for the
    submap-sharded distributed path. Losses are static (not vmapped)."""
    losses = [None, None]
    if kw.get("with_rel_pose", True):
        losses.append(1.0)
    if kw.get("with_vision", False):
        losses.append(2.0)
        if kw.get("n_idp", 0) > 0:
            losses.append(2.0)
    keys = jax.random.split(key, batch)
    windows, families = jax.vmap(lambda k: build_lvio_window(k, **kw)[:2])(keys)
    return windows, families, tuple(losses)
