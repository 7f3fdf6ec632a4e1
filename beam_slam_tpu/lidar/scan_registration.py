"""Scan registration strategies producing factor-graph measurements.

Re-implements the reference's scan_registration library (SURVEY.md §2.4):
  * ScanToMapLoamRegistration (bs_models/src/lib/scan_registration/
    scan_to_map_registration.cpp): register each scan against the rolling
    RegistrationMap, chain a relative-pose factor to the previous scan pose
    (measured in the lidar frame → with-extrinsics factor), first-scan prior.
  * MultiScanRegistration (multi_scan_registration.cpp): register the new
    scan against each of the last N reference scans, one relative factor per
    successful match.
  * RegistrationValidation (registration_validation.cpp): sanity gates on the
    registration result vs the initial estimate.

All heavy math happens in the jitted LOAM kernel
(:mod:`beam_slam_tpu.lidar.registration`); this module is thin host
orchestration emitting :class:`~beam_slam_tpu.solver.smoother.Transaction`
entries.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import registration as reg
from beam_slam_tpu.lidar.cloud import FeatureCloud
from beam_slam_tpu.lidar.registration_map import RegistrationMap
from beam_slam_tpu.solver.smoother import Transaction

LIDAR_SENSOR = "lidar"


@dataclasses.dataclass
class ScanRegistrationParams:
    """Mirrors ScanRegistrationParamsBase (scan_registration_base.h:22-48)."""

    min_motion_trans_m: float = 0.0
    min_motion_rot_deg: float = 0.0
    max_motion_trans_m: float = 10.0
    fix_first_scan: bool = True
    # validation gates (RegistrationValidation): registered-vs-seed limits.
    # NOTE: the seed comes from IMU odometry anchored to the *graph*, while
    # registration is anchored to the *map*; slow graph-vs-map divergence
    # shows up here as a growing "correction" even when registration is
    # perfectly healthy — so these bounds must be generous (they only catch
    # true divergence), unlike registration-quality gates (inliers/residual)
    # which live in LoamRegistrationConfig.
    max_correction_trans_m: float = 2.0
    max_correction_rot_deg: float = 45.0
    # measurement covariance: fixed diagonal (reference 'use fixed covariance'
    # option) or derived from the GN information when None
    fixed_covariance: Optional[float] = 1e-4
    covariance_weight: float = 1.0


def _pose_delta(q_a, p_a, q_b, p_b):
    """T_A⁻¹·T_B as (dq, dp)."""
    dq = lie.quat_mul(lie.quat_conj(q_a), q_b)
    dp = lie.quat_rotate(lie.quat_conj(q_a), p_b - p_a)
    return dq, dp


def _validate(q_seed, p_seed, q_reg, p_reg, params: ScanRegistrationParams):
    dq, dp = _pose_delta(q_seed, p_seed, q_reg, p_reg)
    trans = float(jnp.linalg.norm(dp))
    rot = float(np.rad2deg(np.linalg.norm(np.asarray(lie.so3_log(dq)))))
    return (trans < params.max_correction_trans_m
            and rot < params.max_correction_rot_deg)


def _sqrt_info_6(params: ScanRegistrationParams, information) -> np.ndarray:
    if params.fixed_covariance is not None:
        w = 1.0 / np.sqrt(params.fixed_covariance * params.covariance_weight)
        return (w * np.eye(6)).astype(np.float32)
    A = reg.sqrt_info_from_information(
        information, scale=1.0 / params.covariance_weight)
    return np.asarray(A, np.float32)


class ScanToMapLoamRegistration:
    """Register scans against the rolling local map; emit chained relative
    pose factors (scan_to_map_registration.cpp:23-92).

    Frames: seeds and priors are **baselink** poses (ScanPose stores the pose
    baselink→reference, scan_pose.h:21); registration itself runs in the
    lidar frame through the T_BASELINK_LIDAR extrinsic, and the emitted
    relative factor is measured in the lidar frame (with-extrinsics factor).
    """

    def __init__(self, params: ScanRegistrationParams = ScanRegistrationParams(),
                 reg_cfg: reg.LoamRegistrationConfig = reg.LoamRegistrationConfig(),
                 map_size: int = 10, q_bl=None, p_bl=None):
        self.params = params
        self.reg_cfg = reg_cfg
        self.map = RegistrationMap(map_size=map_size)
        # T_BASELINK_LIDAR extrinsic (identity when the lidar is the baselink)
        self.q_bl = jnp.asarray([1.0, 0, 0, 0] if q_bl is None else q_bl,
                                jnp.float32)
        self.p_bl = jnp.asarray([0.0, 0, 0] if p_bl is None else p_bl,
                                jnp.float32)
        self.prev: Optional[tuple] = None  # (stamp, q, p) lidar in map frame
        self.failures = 0

    def _lidar_from_baselink(self, q_wb, p_wb):
        q = lie.quat_mul(q_wb, self.q_bl)
        p = p_wb + lie.quat_rotate(q_wb, self.p_bl)
        return q, p

    def _baselink_from_lidar(self, q_wl, p_wl):
        q_lb = lie.quat_conj(self.q_bl)
        p_lb = -lie.quat_rotate(q_lb, self.p_bl)
        q = lie.quat_mul(q_wl, q_lb)
        p = p_wl + lie.quat_rotate(q_wl, p_lb)
        return q, p

    def register_new_scan(self, stamp: float, features: FeatureCloud,
                          q_seed_bl, p_seed_bl, txn: Transaction) -> bool:
        """q_seed_bl/p_seed_bl: initial T_MAP_BASELINK estimate
        (frame-initializer). On success appends a relative-pose factor (lidar
        frame, extrinsic ``LIDAR_SENSOR``) between the previous and new
        stamps to ``txn`` and returns True; the first scan gets a prior on
        the baselink pose instead."""
        q_seed, p_seed = self._lidar_from_baselink(
            jnp.asarray(q_seed_bl, jnp.float32),
            jnp.asarray(p_seed_bl, jnp.float32))

        if self.prev is None and self.map.empty:
            self.map.add_scan(stamp, q_seed, p_seed, features)
            if self.params.fix_first_scan:
                # near-perfect prior (1e-9 covariance,
                # scan_registration_base.cpp) on the *baselink* pose;
                # sqrt-info 1/√cov ≈ 3.2e4 stays inside f32 dynamic range
                txn.add_abs_pose(stamp, np.asarray(q_seed_bl, np.float32),
                                 np.asarray(p_seed_bl, np.float32),
                                 (1.0 / np.sqrt(1e-9))
                                 * np.eye(6, dtype=np.float32))
            self.prev = (stamp, q_seed, p_seed)
            return True

        # motion gating vs previous registered pose
        if self.prev is not None:
            _, q_prev, p_prev = self.prev
            dq, dp = _pose_delta(q_prev, p_prev, q_seed, p_seed)
            trans = float(jnp.linalg.norm(dp))
            rot_deg = float(np.rad2deg(np.linalg.norm(
                np.asarray(lie.so3_log(dq)))))
            if trans > self.params.max_motion_trans_m:
                self.failures += 1
                return False
            if (self.params.min_motion_trans_m > 0
                    or self.params.min_motion_rot_deg > 0):
                if (trans < self.params.min_motion_trans_m
                        and rot_deg < self.params.min_motion_rot_deg):
                    return False  # too little motion: skip (not a failure)

        me, mev, ms, msv = self.map.world_frame()
        result = reg.register_loam(features, me, mev, ms, msv,
                                   q_seed, p_seed, self.reg_cfg)
        if not bool(result.converged) or not _validate(
                q_seed, p_seed, result.q, result.p, self.params):
            self.failures += 1
            return False
        self.failures = 0

        prev_stamp, q_prev, p_prev = self.prev
        dq, dp = _pose_delta(q_prev, p_prev, result.q, result.p)
        txn.add_relative_pose(
            prev_stamp, stamp, np.asarray(dq), np.asarray(dp),
            _sqrt_info_6(self.params, result.information),
            sensor=LIDAR_SENSOR)

        self.map.add_scan(stamp, result.q, result.p, features)
        self.prev = (stamp, result.q, result.p)
        return True


class MultiScanLoamRegistration:
    """Register the new scan against each of the last ``num_neighbors``
    reference scans; one relative factor per match
    (multi_scan_registration.cpp)."""

    def __init__(self, params: ScanRegistrationParams = ScanRegistrationParams(),
                 reg_cfg: reg.LoamRegistrationConfig = reg.LoamRegistrationConfig(),
                 num_neighbors: int = 3, lag_duration: float = 10.0,
                 q_bl=None, p_bl=None):
        self.params = params
        self.reg_cfg = reg_cfg
        self.num_neighbors = num_neighbors
        self.lag_duration = lag_duration
        self.q_bl = jnp.asarray([1.0, 0, 0, 0] if q_bl is None else q_bl,
                                jnp.float32)
        self.p_bl = jnp.asarray([0.0, 0, 0] if p_bl is None else p_bl,
                                jnp.float32)
        self.refs: list = []  # (stamp, q, p, features) newest-last
        self.failures = 0

    def register_new_scan(self, stamp: float, features: FeatureCloud,
                          q_seed_bl, p_seed_bl, txn: Transaction) -> bool:
        """Seeds are baselink poses (same frame conventions as
        ScanToMapLoamRegistration)."""
        q_wb = jnp.asarray(q_seed_bl, jnp.float32)
        p_wb = jnp.asarray(p_seed_bl, jnp.float32)
        q_seed = lie.quat_mul(q_wb, self.q_bl)
        p_seed = p_wb + lie.quat_rotate(q_wb, self.p_bl)
        # prune by lag
        self.refs = [r for r in self.refs
                     if stamp - r[0] <= self.lag_duration]

        if not self.refs:
            if self.params.fix_first_scan:
                # prior on the baselink pose (ScanPose frame convention)
                txn.add_abs_pose(stamp, np.asarray(q_wb), np.asarray(p_wb),
                                 (1.0 / np.sqrt(1e-9))
                                 * np.eye(6, dtype=np.float32))
            self.refs.append((stamp, q_seed, p_seed, features))
            return True

        n_ok = 0
        q_reg, p_reg = q_seed, p_seed
        for (r_stamp, r_q, r_p, r_feat) in self.refs[-self.num_neighbors:]:
            ref_world = r_feat.transform(r_q, r_p)
            me = ref_world.edge_strong
            mev = r_feat.edge_strong_valid
            me = jnp.concatenate([me, ref_world.edge_weak])
            mev = jnp.concatenate([mev, r_feat.edge_weak_valid])
            ms = jnp.concatenate([ref_world.surf_strong, ref_world.surf_weak])
            msv = jnp.concatenate([r_feat.surf_strong_valid,
                                   r_feat.surf_weak_valid])
            result = reg.register_loam(features, me, mev, ms, msv,
                                       q_seed, p_seed, self.reg_cfg)
            if not bool(result.converged) or not _validate(
                    q_seed, p_seed, result.q, result.p, self.params):
                continue
            dq, dp = _pose_delta(r_q, r_p, result.q, result.p)
            txn.add_relative_pose(
                r_stamp, stamp, np.asarray(dq), np.asarray(dp),
                _sqrt_info_6(self.params, result.information),
                sensor=LIDAR_SENSOR)
            q_reg, p_reg = result.q, result.p
            n_ok += 1

        if n_ok == 0:
            self.failures += 1
            return False
        self.failures = 0
        self.refs.append((stamp, q_reg, p_reg, features))
        return True
