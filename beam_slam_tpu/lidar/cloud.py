"""Fixed-shape point-cloud containers.

Replaces the PCL types used throughout the reference
(``PointXYZIRT`` Velodyne / ``PointXYZITRRNR`` Ouster —
bs_models/include/bs_models/lidar/scan_pose.h:44-82) with static-shape
arrays + validity masks, and provides the host-side "organize" step that bins
an unordered scan into the ring-major grid consumed by the LOAM feature
kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie


class RingGrid(NamedTuple):
    """Ring-organized scan: [R, W] grid, azimuth-ordered within each ring.
    ``time`` is the per-point relative timestamp (seconds from scan start,
    Velodyne 'time' field / Ouster 't') used for deskewing."""

    xyz: jnp.ndarray    # [R, W, 3]
    time: jnp.ndarray   # [R, W]
    valid: jnp.ndarray  # [R, W] bool


class FeatureCloud(NamedTuple):
    """LOAM feature sets with strong/weak split (libbeam LoamPointCloud
    semantics: edges/surfaces × strong/weak)."""

    edge_strong: jnp.ndarray   # [E1, 3]
    edge_strong_valid: jnp.ndarray
    edge_weak: jnp.ndarray     # [E2, 3]
    edge_weak_valid: jnp.ndarray
    surf_strong: jnp.ndarray   # [S1, 3]
    surf_strong_valid: jnp.ndarray
    surf_weak: jnp.ndarray     # [S2, 3]
    surf_weak_valid: jnp.ndarray

    def transform(self, q: jnp.ndarray, p: jnp.ndarray) -> "FeatureCloud":
        rot = lambda x: lie.quat_rotate(q[None, :], x) + p[None, :]
        return self._replace(
            edge_strong=rot(self.edge_strong), edge_weak=rot(self.edge_weak),
            surf_strong=rot(self.surf_strong), surf_weak=rot(self.surf_weak))


def organize_scan(points: np.ndarray, rings: np.ndarray,
                  times: Optional[np.ndarray], n_rings: int,
                  width: int) -> RingGrid:
    """Host-side binning of an unordered scan into a ring-major, azimuth-
    sorted grid (the layout the device kernels need; replaces PCL's
    ring-indexed access). Runs once per scan on ingest — native C++ when the
    compiled library is available (beam_slam_tpu.ops.native), NumPy
    otherwise.
    """
    from beam_slam_tpu.ops import native
    out = native.organize_scan_native(points, rings, times, n_rings, width)
    if out is not None:
        xyz, tgrid, valid = out
        return RingGrid(xyz=jnp.asarray(xyz), time=jnp.asarray(tgrid),
                        valid=jnp.asarray(valid))
    points = np.asarray(points, np.float32)
    n = len(points)
    if times is None:
        times = np.zeros(n, np.float32)
    az = np.arctan2(points[:, 1], points[:, 0])
    order = np.lexsort((az, rings))
    points, rings, times, az = (points[order], np.asarray(rings)[order],
                                np.asarray(times, np.float32)[order],
                                az[order])

    xyz = np.zeros((n_rings, width, 3), np.float32)
    tgrid = np.zeros((n_rings, width), np.float32)
    valid = np.zeros((n_rings, width), bool)
    for r in range(n_rings):
        sel = rings == r
        m = min(int(sel.sum()), width)
        if m == 0:
            continue
        xyz[r, :m] = points[sel][:m]
        tgrid[r, :m] = times[sel][:m]
        valid[r, :m] = True
    return RingGrid(xyz=jnp.asarray(xyz), time=jnp.asarray(tgrid),
                    valid=jnp.asarray(valid))


def synthetic_structured_scene(n_rings=16, width=512, seed=0,
                               vertical_fov=(-15.0, 15.0)):
    """Simulated structured environment scan (walls + poles) for tests —
    plays the role of the reference's tests/data/test_scan_vlp16.pcd fixture:
    a scene with clean planar and edge structure, expressed as the exact
    ranges a spinning lidar at the origin would measure.

    Room: axis-aligned box walls at x=±8, y=±6, ceiling/floor z=±2.5, plus
    four vertical poles (cylinders r=0.15) — edges come from pole silhouettes
    and wall corners.
    """
    rng = np.random.default_rng(seed)
    az = np.linspace(-np.pi, np.pi, width, endpoint=False)
    el = np.deg2rad(np.linspace(vertical_fov[0], vertical_fov[1], n_rings))
    d = np.stack(np.broadcast_arrays(
        np.cos(el)[:, None] * np.cos(az)[None, :],
        np.cos(el)[:, None] * np.sin(az)[None, :],
        np.sin(el)[:, None] * np.ones_like(az)[None, :]), axis=-1)  # [R,W,3]

    t_best = np.full((n_rings, width), np.inf)
    # walls: planes n·x = c with n outward
    for n_vec, c in [([1, 0, 0], 8.0), ([-1, 0, 0], 8.0), ([0, 1, 0], 6.0),
                     ([0, -1, 0], 6.0), ([0, 0, 1], 2.5), ([0, 0, -1], 2.5)]:
        n_vec = np.asarray(n_vec, np.float64)
        denom = d @ n_vec
        t = np.where(denom > 1e-6, c / np.maximum(denom, 1e-6), np.inf)
        t_best = np.minimum(t_best, t)
    # poles: vertical cylinders at (cx, cy), radius r
    for cx, cy in [(3.0, 2.0), (-2.0, 3.5), (4.0, -3.0), (-5.0, -2.0)]:
        r = 0.15
        dx, dy = d[..., 0], d[..., 1]
        a = dx * dx + dy * dy
        b = -2 * (cx * dx + cy * dy)
        c0 = cx * cx + cy * cy - r * r
        disc = b * b - 4 * a * c0
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a),
                     np.inf)
        t = np.where(t > 0.1, t, np.inf)
        t_best = np.minimum(t_best, t)

    xyz = d * t_best[..., None]
    valid = np.isfinite(t_best) & (t_best < 100.0)
    xyz = np.where(valid[..., None], xyz, 0.0).astype(np.float32)
    # per-point time: one revolution over 0.1 s by azimuth
    tgrid = np.broadcast_to(((az + np.pi) / (2 * np.pi) * 0.1)[None, :],
                            (n_rings, width)).astype(np.float32)
    return RingGrid(xyz=jnp.asarray(xyz), time=jnp.asarray(tgrid),
                    valid=jnp.asarray(valid))


def transform_grid(grid: RingGrid, q, p) -> RingGrid:
    """Rigidly transform every point of the grid."""
    xyz = lie.quat_rotate(q[None, None, :], grid.xyz) + p[None, None, :]
    return grid._replace(xyz=jnp.where(grid.valid[..., None], xyz, 0.0))
