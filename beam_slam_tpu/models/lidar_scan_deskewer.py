"""Lidar scan deskewer model.

Re-implements the reference ``LidarScanDeskewer`` plugin
(bs_models/src/lidar_scan_deskewer.cpp:13-62): per-point motion compensation
of incoming scans using frame-initializer (inertial-odometry) poses, then
republishing the undistorted cloud ('points_undistorted'). Velodyne (time
field) and Ouster point types both reduce to the RingGrid per-point
timestamps here. The per-point pose interpolation runs as one vectorized
kernel (:mod:`beam_slam_tpu.lidar.deskew`) instead of a per-point pose
query.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import deskew as dsk
from beam_slam_tpu.lidar.cloud import RingGrid


class LidarScanDeskewer:
    def __init__(self, frame_initializer: Callable,
                 q_baselink_lidar=None, p_baselink_lidar=None):
        """``frame_initializer(t) → (q_wb, p_wb) | None`` supplies baselink
        poses (IMU odometry); extrinsic converts them to lidar poses."""
        self.frame_initializer = frame_initializer
        self.q_bl = jnp.asarray(
            [1.0, 0, 0, 0] if q_baselink_lidar is None else q_baselink_lidar,
            jnp.float32)
        self.p_bl = jnp.asarray(
            [0.0, 0, 0] if p_baselink_lidar is None else p_baselink_lidar,
            jnp.float32)
        self.published = 0

    def _lidar_pose(self, t: float):
        pose = self.frame_initializer(t)
        if pose is None:
            return None
        q_wb, p_wb = pose
        q = lie.quat_mul(jnp.asarray(q_wb, jnp.float32), self.q_bl)
        p = jnp.asarray(p_wb, jnp.float32) + lie.quat_rotate(
            jnp.asarray(q_wb, jnp.float32), self.p_bl)
        return q, p

    def process_scan(self, stamp: float, grid: RingGrid
                     ) -> Optional[RingGrid]:
        """Returns the deskewed grid (scan-start frame), or the input
        unchanged if poses are unavailable (the reference queues/waits; we
        pass through so downstream still works)."""
        t_span = float(jnp.max(jnp.where(grid.valid, grid.time, 0.0)))
        pose0 = self._lidar_pose(stamp)
        pose1 = self._lidar_pose(stamp + t_span)
        if pose0 is None or pose1 is None or t_span <= 0:
            return grid
        q0, p0 = pose0
        q1, p1 = pose1
        out = dsk.deskew(grid, q0, p0, q1, p1, 0.0, t_span)
        self.published += 1
        return out
