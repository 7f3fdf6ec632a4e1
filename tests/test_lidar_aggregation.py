"""LidarAggregation (experimental tier): motion-compensated multi-scan
aggregation into one output frame."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.models.lidar_aggregation import (LidarAggregation,
                                                    LidarAggregationParams)

SCENE = synthetic_structured_scene(n_rings=16, width=504)


def test_aggregation_aligns_scans_across_motion():
    # poses move along +x; frame initializer returns them exactly
    def fi(t):
        return (np.array([1, 0, 0, 0], np.float32),
                np.array([0.5 * t, 0.0, 0.0], np.float32))

    agg = LidarAggregation(fi, LidarAggregationParams(aggregation_time_s=2.0))
    for k in range(3):
        t = 0.5 * k
        q, p = fi(t)
        xyz = lie.quat_rotate(lie.quat_conj(jnp.asarray(q))[None, None],
                              SCENE.xyz - jnp.asarray(p))
        agg.add_scan(t, SCENE._replace(
            xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0)))
    out = agg.aggregate(1.0)
    assert out is not None
    pts, valid = out
    assert valid.sum() == 3 * int(np.asarray(SCENE.valid).sum())
    # aggregated points expressed at t=1.0: re-projecting to world must land
    # on the static scene geometry (walls at |x|=8 etc.)
    q1, p1 = fi(1.0)
    world = pts[valid] + p1  # identity rotation
    on_struct = (
        (np.abs(np.abs(world[:, 0]) - 8.0) < 0.05)
        | (np.abs(np.abs(world[:, 1]) - 6.0) < 0.05)
        | (np.abs(np.abs(world[:, 2]) - 2.5) < 0.05))
    # most points are walls/floor/ceiling; poles account for the rest
    assert on_struct.mean() > 0.85, on_struct.mean()


def test_aggregation_requires_poses():
    agg = LidarAggregation(lambda t: None)
    agg.add_scan(0.0, SCENE)
    assert agg.aggregate(0.5) is None
