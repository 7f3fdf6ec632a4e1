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
                      dtype=jnp.float32) -> Tuple[WindowState, Tuple, Tuple]:
    """Returns (window, families, losses) for one synthetic LVIO window."""
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

    window = WindowState.zeros(K, E=2, dtype=dtype)
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

    return window, tuple(families), tuple(losses)


def build_lvio_batch(key: jax.Array, batch: int, **kw):
    """Batch of independent windows (leading axis = submap), for the
    submap-sharded distributed path. Losses are static (not vmapped)."""
    losses = (None, None) + ((1.0,) if kw.get("with_rel_pose", True) else ())
    keys = jax.random.split(key, batch)
    windows, families = jax.vmap(lambda k: build_lvio_window(k, **kw)[:2])(keys)
    return windows, families, losses
