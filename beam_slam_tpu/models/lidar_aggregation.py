"""Lidar aggregation model (experimental tier).

Re-implements the reference's experimental ``LidarAggregation`` sensor model
(bs_models/experimental — motion-compensated aggregation of consecutive
scans into one dense cloud at an output timestamp, SURVEY.md §2.4): each
buffered scan is deskewed with frame-initializer poses and re-expressed in
the output stamp's frame, then concatenated.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import deskew as dsk
from beam_slam_tpu.lidar.cloud import RingGrid


@dataclasses.dataclass
class LidarAggregationParams:
    max_scans: int = 10
    aggregation_time_s: float = 1.0


class LidarAggregation:
    def __init__(self, frame_initializer: Callable,
                 params: LidarAggregationParams = LidarAggregationParams(),
                 q_baselink_lidar=None, p_baselink_lidar=None):
        self.frame_initializer = frame_initializer
        self.params = params
        self.q_bl = jnp.asarray(
            [1.0, 0, 0, 0] if q_baselink_lidar is None else q_baselink_lidar,
            jnp.float32)
        self.p_bl = jnp.asarray(
            [0.0, 0, 0] if p_baselink_lidar is None else p_baselink_lidar,
            jnp.float32)
        self.buffer: List[Tuple[float, RingGrid]] = []

    def _lidar_pose(self, t: float):
        pose = self.frame_initializer(t)
        if pose is None:
            return None
        q_wb, p_wb = pose
        q = lie.quat_mul(jnp.asarray(q_wb, jnp.float32), self.q_bl)
        p = jnp.asarray(p_wb, jnp.float32) + lie.quat_rotate(
            jnp.asarray(q_wb, jnp.float32), self.p_bl)
        return q, p

    def add_scan(self, stamp: float, grid: RingGrid):
        self.buffer.append((stamp, grid))
        cutoff_n = self.params.max_scans
        if len(self.buffer) > cutoff_n:
            self.buffer = self.buffer[-cutoff_n:]

    def aggregate(self, t_out: float
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Aggregate buffered scans into the lidar frame at ``t_out``.
        Returns (points [N,3], valid [N]) or None when poses are missing."""
        out_pose = self._lidar_pose(t_out)
        if out_pose is None or not self.buffer:
            return None
        q_o, p_o = out_pose
        q_oi = lie.quat_conj(q_o)
        pts_all, valid_all = [], []
        horizon = t_out - self.params.aggregation_time_s
        for stamp, grid in self.buffer:
            if stamp < horizon or stamp > t_out + 1e-9:
                continue
            t_span = float(jnp.max(jnp.where(grid.valid, grid.time, 0.0)))
            p0 = self._lidar_pose(stamp)
            p1 = self._lidar_pose(stamp + max(t_span, 1e-3))
            if p0 is None or p1 is None:
                continue
            g = dsk.deskew(grid, p0[0], p0[1], p1[0], p1[1], 0.0,
                           max(t_span, 1e-3))
            # scan-start frame → world → output frame
            pw = lie.quat_rotate(p0[0][None, None], g.xyz) + p0[1]
            po = lie.quat_rotate(q_oi[None, None], pw - p_o)
            pts_all.append(np.asarray(po).reshape(-1, 3))
            valid_all.append(np.asarray(grid.valid).reshape(-1))
        if not pts_all:
            return None
        return np.concatenate(pts_all), np.concatenate(valid_all)
