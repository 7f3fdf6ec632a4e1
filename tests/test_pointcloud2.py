"""PointCloud2 ingestion boundary: wire decode of the Velodyne PointXYZIRT
and Ouster PointXYZITRRNR layouts (lidar_odometry.cpp:300-380,
scan_pose.h:44-82), round-trips, NaN handling, and RingGrid ingestion."""

import numpy as np
import pytest

from beam_slam_tpu.lidar import pointcloud2 as pc2
from beam_slam_tpu.lidar.pcd import PointCloud


def _cloud(n=64, rings=16, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    return PointCloud(
        xyz=xyz,
        intensity=rng.uniform(0, 255, n).astype(np.float32),
        ring=np.arange(n, dtype=np.int32) % rings,
        time=np.linspace(0, 0.1, n).astype(np.float32))


@pytest.mark.parametrize("lidar_type", ["velodyne", "ouster"])
def test_round_trip(lidar_type):
    c = _cloud()
    msg = pc2.encode_pointcloud2(c, lidar_type, stamp=1.5)
    # auto-detection picks the right layout from field names
    out = pc2.decode_pointcloud2(msg, "auto")
    np.testing.assert_allclose(out.xyz, c.xyz)
    np.testing.assert_allclose(out.intensity, c.intensity)
    np.testing.assert_array_equal(out.ring, c.ring)
    # ouster stores nanoseconds uint32 → quantization ≤ 1 ns
    np.testing.assert_allclose(out.time, c.time, atol=2e-9)


def test_velodyne_layout_is_wire_exact():
    """Byte layout must match velodyne_pointcloud's PointXYZIRT: float32
    x/y/z/intensity at 0/4/8/12, uint16 ring at 16, float32 time at 18."""
    c = _cloud(n=2)
    msg = pc2.encode_pointcloud2(c, "velodyne")
    assert msg.point_step == 22
    assert [(f.name, f.offset) for f in msg.fields] == [
        ("x", 0), ("y", 4), ("z", 8), ("intensity", 12), ("ring", 16),
        ("time", 18)]
    x0 = np.frombuffer(msg.data[:4], np.float32)[0]
    assert x0 == c.xyz[0, 0]
    ring0 = np.frombuffer(msg.data[16:18], np.uint16)[0]
    assert ring0 == c.ring[0]


def test_ouster_nanoseconds_relative():
    """Ouster 't' is absolute-ish ns since frame start; decode must yield
    relative seconds like pcd.load_pcd does."""
    c = _cloud(n=8)
    msg = pc2.encode_pointcloud2(c, "ouster")
    # shift all timestamps by a constant: relative times must not change
    rec = np.frombuffer(bytearray(msg.data), pc2._structured_dtype(msg)).copy()
    rec["t"] = rec["t"] + 10_000_000
    msg2 = pc2.PointCloud2Msg(**{**msg.__dict__, "data": rec.tobytes()})
    out = pc2.decode_pointcloud2(msg2)
    np.testing.assert_allclose(out.time, c.time, atol=2e-9)


def test_non_dense_nan_points_dropped():
    c = _cloud(n=16)
    xyz = c.xyz.copy()
    xyz[3] = np.nan
    xyz[9, 1] = np.inf
    msg = pc2.encode_pointcloud2(c._replace(xyz=xyz), "velodyne")
    assert not msg.is_dense
    out = pc2.decode_pointcloud2(msg)
    assert len(out.xyz) == 14
    keep = np.ones(16, bool)
    keep[[3, 9]] = False
    np.testing.assert_array_equal(out.ring, c.ring[keep])


def test_big_endian_and_row_padding():
    """Foreign-endian data and padded rows both decode (the PointCloud2
    spec allows row_step > width*point_step)."""
    c = _cloud(n=6)
    msg = pc2.encode_pointcloud2(c, "velodyne")
    dt = pc2._structured_dtype(msg)
    rec = np.frombuffer(msg.data, dt)
    # re-emit as big-endian, 2 rows of 3 with 8 pad bytes per row
    be = pc2._structured_dtype(pc2.PointCloud2Msg(
        0, "l", 2, 3, msg.fields, True, msg.point_step,
        3 * msg.point_step + 8, b""))
    buf = bytearray()
    for r in range(2):
        row = np.zeros(3, be)
        for name in rec.dtype.names:
            row[name] = rec[name][3 * r:3 * r + 3]
        buf += row.tobytes() + b"\x00" * 8
    msg_be = pc2.PointCloud2Msg(0.0, "l", 2, 3, msg.fields, True,
                                msg.point_step, 3 * msg.point_step + 8,
                                bytes(buf))
    out = pc2.decode_pointcloud2(msg_be)
    np.testing.assert_allclose(out.xyz, c.xyz)
    np.testing.assert_array_equal(out.ring, c.ring)


def test_local_mapper_ingests_pointcloud2():
    """on_pointcloud2 routes a wire message into the pipeline with the
    configured scan geometry (the subscriber boundary)."""
    from beam_slam_tpu.pipeline.config import (CalibrationConfig,
                                               LocalMapperConfig)
    from beam_slam_tpu.pipeline.local_mapper import LocalMapper

    cfg = LocalMapperConfig(
        mode="LIO", max_states=8,
        calibration=CalibrationConfig(
            q_baselink_lidar=np.array([1, 0, 0, 0], np.float32),
            p_baselink_lidar=np.zeros(3, np.float32),
            lidar_type="velodyne", lidar_rings=16, lidar_width=120))
    mapper = LocalMapper(cfg)
    c = _cloud(n=512, rings=16, seed=3)
    msg = pc2.encode_pointcloud2(c, "velodyne", stamp=0.1)
    out = mapper.on_pointcloud2(msg)
    assert isinstance(out, (bool, np.bool_))


def test_ring_grid_from_msg():
    c = _cloud(n=256, rings=16)
    msg = pc2.encode_pointcloud2(c, "ouster")
    grid = pc2.ring_grid_from_msg(msg, n_rings=16, width=32)
    assert grid.xyz.shape == (16, 32, 3)
    assert bool(np.asarray(grid.valid).any())
    # every valid grid point must be one of the input points
    v = np.asarray(grid.valid)
    gx = np.asarray(grid.xyz)[v]
    d = np.linalg.norm(gx[:, None, :] - c.xyz[None], axis=-1).min(axis=1)
    assert d.max() < 1e-5
