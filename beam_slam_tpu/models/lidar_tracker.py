"""LidarTracker — lidar odometry with GLOBAL-map registration.

Re-implements the experimental ``bs_models::LidarTracker``
(bs_models/experimental/src/lidar_tracker.cpp, 848 LoC; header documents it
as LidarOdometry + global registration): each scan is

  1. registered LOCALLY (scan-to-map against the rolling registration map →
     relative-pose factor, exactly LidarOdometry's warm path), and
  2. registered GLOBALLY against the :class:`ActiveSubmap` published by the
     global mapper (RegisterScanToGlobalMap, lidar_tracker.cpp:405-470):
     the scan's features — at the current map-frame estimate — are matched
     to the active submap's LOAM map; a pass of the registration validation
     yields an ABSOLUTE pose factor T_MAP_BASELINK, anchoring local drift
     to the global frame;

plus periodic reloc requests (SendRelocRequest, reloc_request_period) and
smooth/global odometry logs (odom_publisher_smooth_/_global_).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.global_mapping.active_submap import ActiveSubmap
from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar import filters as lfil
from beam_slam_tpu.lidar import registration as reg
from beam_slam_tpu.lidar.cloud import RingGrid
from beam_slam_tpu.lidar.scan_registration import (
    ScanRegistrationParams, _pose_delta, _validate)
from beam_slam_tpu.solver.smoother import FixedLagSmoother, Transaction


@dataclasses.dataclass
class LidarTrackerParams:
    """parameters/models/lidar_tracker_params.h equivalents."""

    reloc_request_period_s: float = 1.0
    global_registration_cov: float = 1e-3
    trigger_inertial_odometry: bool = True
    max_failures_before_reset: int = 10


class LidarTracker:
    def __init__(self, smoother: FixedLagSmoother, registration,
                 active_submap: Optional[ActiveSubmap] = None,
                 params: LidarTrackerParams = LidarTrackerParams(),
                 loam_cfg: feat.LoamConfig = feat.LoamConfig(),
                 global_reg_cfg: Optional[reg.LoamRegistrationConfig] = None,
                 trigger_cb: Optional[Callable[[float], None]] = None,
                 frame_initializer: Optional[Callable] = None,
                 reloc_request_cb: Optional[Callable] = None,
                 input_filters=()):
        """``registration``: the LOCAL strategy (factory product);
        ``reloc_request_cb(stamp, features, q_wb, p_wb)`` forwards reloc
        requests to the global mapper."""
        self.smoother = smoother
        self.registration = registration
        self.active_submap = active_submap
        self.params = params
        self.loam_cfg = loam_cfg
        self.global_reg_cfg = global_reg_cfg or reg.LoamRegistrationConfig(
            iterations=8, max_corr_dist=1.0)
        self.trigger_cb = trigger_cb
        self.frame_initializer = frame_initializer
        self.reloc_request_cb = reloc_request_cb
        self.input_filters = tuple(input_filters)
        self.initialized = False
        self.last_stamp = -np.inf
        self.last_reloc_request = -np.inf
        self.failures = 0
        self.reset_count = 0
        self.global_anchor_count = 0
        # odometry logs: (stamp, q, p) — "smooth" integrates relative motion,
        # "global" is the map-frame estimate (lidar_tracker.cpp:261-284)
        self.odom_smooth: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.odom_global: List[Tuple[float, np.ndarray, np.ndarray]] = []

    def initialize(self, stamp: float):
        self.initialized = True

    def process_scan(self, stamp: float, grid: RingGrid) -> bool:
        if not self.initialized or stamp <= self.last_stamp:
            return False
        self.last_stamp = stamp

        if self.frame_initializer is not None:
            q_seed, p_seed = self.frame_initializer(stamp)
        elif self.odom_global:
            _, q_seed, p_seed = self.odom_global[-1]
        else:
            q_seed, p_seed = np.array([1, 0, 0, 0], np.float32), np.zeros(3)

        if self.input_filters:
            grid = lfil.apply_filters(grid, self.input_filters)
        fc = feat.extract_features(grid, self.loam_cfg)
        txn = Transaction(stamp=stamp, sensor_id="lidar_tracker")
        if stamp not in self.smoother.slot_of_stamp:
            txn.add_imu_state(stamp, q_seed, p_seed, np.zeros(3))

        ok_local = self.registration.register_new_scan(
            stamp, fc, q_seed, p_seed, txn, grid=grid)
        q_glob, p_glob = self._register_to_global_map(stamp, fc, q_seed,
                                                      p_seed, txn)
        if not ok_local and q_glob is None:
            self.failures += 1
            if self.failures >= self.params.max_failures_before_reset:
                self.reset_count += 1
                self.failures = 0
            return False
        self.failures = 0
        self.smoother.send_transaction(txn)

        # odometry publishing (lidar_tracker.cpp:261-284): global = current
        # map-frame estimate; smooth = previous smooth pose ∘ relative motion
        q_cur, p_cur = (q_glob, p_glob) if q_glob is not None else \
            (np.asarray(q_seed, np.float32), np.asarray(p_seed, np.float32))
        if self.odom_global:
            _, q_lg, p_lg = self.odom_global[-1]
            dq, dp = _pose_delta(jnp.asarray(q_lg), jnp.asarray(p_lg),
                                 jnp.asarray(q_cur), jnp.asarray(p_cur))
            _, q_ls, p_ls = self.odom_smooth[-1]
            q_s = lie.quat_mul(jnp.asarray(q_ls), dq)
            p_s = jnp.asarray(p_ls) + lie.quat_rotate(jnp.asarray(q_ls), dp)
            self.odom_smooth.append((stamp, np.asarray(q_s), np.asarray(p_s)))
        else:
            self.odom_smooth.append((stamp, q_cur, p_cur))
        self.odom_global.append((stamp, q_cur, p_cur))

        # periodic reloc request (SendRelocRequest)
        if (self.reloc_request_cb is not None
                and stamp - self.last_reloc_request
                >= self.params.reloc_request_period_s):
            self.last_reloc_request = stamp
            self.reloc_request_cb(stamp, fc, q_cur, p_cur)
        if self.params.trigger_inertial_odometry and self.trigger_cb:
            self.trigger_cb(stamp)
        return True

    def _register_to_global_map(self, stamp, fc, q_seed_bl, p_seed_bl, txn):
        """RegisterScanToGlobalMap (lidar_tracker.cpp:405-470): match the
        scan (at its current map-frame estimate) against the active submap's
        LOAM map; on success add an absolute pose factor. Returns the
        corrected (q_wb, p_wb) or (None, None)."""
        if self.active_submap is None or self.active_submap.empty:
            return None, None
        q_bl = getattr(self.registration, "q_bl", jnp.asarray(
            [1.0, 0, 0, 0], jnp.float32))
        p_bl = getattr(self.registration, "p_bl", jnp.zeros(3, jnp.float32))
        q_wb = jnp.asarray(q_seed_bl, jnp.float32)
        p_wb = jnp.asarray(p_seed_bl, jnp.float32)
        q_wl = lie.quat_mul(q_wb, q_bl)
        p_wl = p_wb + lie.quat_rotate(q_wb, p_bl)

        me, mev, ms, msv = self.active_submap.get_loam_map()
        res = reg.register_loam(fc, me, mev, ms, msv, q_wl, p_wl,
                                self.global_reg_cfg)
        if not bool(res.converged):
            return None, None
        # validation threshold vs the estimate (PassedRegThreshold →
        # RegistrationValidation)
        params = getattr(self.registration, "params",
                         ScanRegistrationParams())
        if not _validate(q_wl, p_wl, res.q, res.p, params):
            return None, None
        # T_MAP_BASELINK = T_MAP_LIDAR · T_LIDAR_BASELINK
        q_lb = lie.quat_conj(q_bl)
        p_lb = -lie.quat_rotate(q_lb, p_bl)
        q_mb = lie.quat_mul(res.q, q_lb)
        p_mb = res.p + lie.quat_rotate(res.q, p_lb)
        w = 1.0 / np.sqrt(self.params.global_registration_cov)
        txn.add_abs_pose(stamp, np.asarray(q_mb), np.asarray(p_mb),
                         w * np.eye(6, dtype=np.float32))
        self.global_anchor_count += 1
        return np.asarray(q_mb, np.float32), np.asarray(p_mb, np.float32)
