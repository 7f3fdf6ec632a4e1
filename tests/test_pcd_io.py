"""PCD reader (Velodyne/Ouster channel handling) + calibration viewer
artifacts (bs_tools calibration_viewer_node equivalent)."""

import os
import struct

import numpy as np
import pytest

from beam_slam_tpu.lidar.cloud import organize_scan
from beam_slam_tpu.lidar.pcd import load_pcd


def write_ouster_pcd(path, n=64):
    """Binary PCD in the Ouster PointXYZITRRNR spirit: x y z intensity
    t(ns, uint32) ring(uint16) (scan_pose.h:62-82)."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    t_ns = (np.linspace(0, 0.1, n) * 1e9).astype(np.uint32) + 1_000_000
    ring = (np.arange(n) % 16).astype(np.uint16)
    header = (
        "# .PCD v0.7\nVERSION 0.7\n"
        "FIELDS x y z intensity t ring\n"
        "SIZE 4 4 4 4 4 2\n"
        "TYPE F F F F U U\n"
        "COUNT 1 1 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<ffffIH", xyz[i, 0], xyz[i, 1], xyz[i, 2],
                                inten[i], int(t_ns[i]), int(ring[i])))
    return xyz, t_ns, ring


def test_ouster_binary_pcd_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "ouster.pcd")
    xyz, t_ns, ring = write_ouster_pcd(path)
    pc = load_pcd(path)
    np.testing.assert_allclose(pc.xyz, xyz, rtol=1e-6)
    np.testing.assert_array_equal(pc.ring, ring.astype(np.int32))
    # Ouster t (ns) → relative seconds from scan start
    np.testing.assert_allclose(
        pc.time, (t_ns - t_ns.min()) * 1e-9, atol=1e-7)
    # feeds the ring organizer directly
    grid = organize_scan(pc.xyz, pc.ring, pc.time, 16, 64)
    assert int(np.asarray(grid.valid).sum()) == len(xyz)


def test_velodyne_ascii_pcd(tmp_path):
    path = os.path.join(tmp_path, "vlp.pcd")
    with open(path, "w") as f:
        f.write("# .PCD v0.7\nVERSION 0.7\n"
                "FIELDS x y z intensity ring time\n"
                "SIZE 4 4 4 4 2 4\nTYPE F F F F U F\n"
                "COUNT 1 1 1 1 1 1\nWIDTH 3\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 3\nDATA ascii\n"
                "1 2 3 10 0 0.00\n4 5 6 20 1 0.05\n7 8 9 30 2 0.10\n")
    pc = load_pcd(path)
    np.testing.assert_allclose(pc.xyz, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    np.testing.assert_array_equal(pc.ring, [0, 1, 2])
    np.testing.assert_allclose(pc.time, [0.0, 0.05, 0.10])


def test_calibration_viewer_artifacts(tmp_path):
    from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
    from beam_slam_tpu.obs.calibration_viewer import (
        project_scan_to_camera, render_overlay_ppm,
        write_calibration_artifacts)
    from beam_slam_tpu.pipeline.config import CalibrationConfig
    from beam_slam_tpu.pipeline.sim_session import CAM, P_BC, P_BL, Q_BC, Q_BL

    calib = CalibrationConfig(camera=CAM, q_baselink_cam=Q_BC,
                              p_baselink_cam=P_BC, q_baselink_lidar=Q_BL,
                              p_baselink_lidar=P_BL)
    grid = synthetic_structured_scene(n_rings=16, width=504)
    uv, depth, ok = project_scan_to_camera(
        np.asarray(grid.xyz), np.asarray(grid.valid), Q_BL, P_BL, Q_BC,
        P_BC, CAM)
    assert int(ok.sum()) > 100  # forward points land in the image
    assert (depth[ok] > 0).all()
    out = write_calibration_artifacts(str(tmp_path), calib, grid=grid)
    assert os.path.exists(out["frames_ply"])
    assert os.path.exists(out["overlay_ppm"])
    assert out["n_projected"] == int(ok.sum())
    with open(out["overlay_ppm"], "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = f.readline().split()
        assert (int(w), int(h)) == (640, 480)
