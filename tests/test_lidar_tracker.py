"""Experimental tier: LidarTracker (local + global-map registration),
ActiveSubmap client, LidarFeatureExtractor — on the real VLP-16 fixture
(reference: bs_models/experimental/src/lidar_tracker.cpp,
lidar_feature_extractor.cpp, lib/global_mapping/active_submap.cpp)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.global_mapping.active_submap import ActiveSubmap
from beam_slam_tpu.global_mapping.submap import Submap
from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar.cloud import organize_scan
from beam_slam_tpu.lidar.pcd import load_pcd
from beam_slam_tpu.lidar.scan_registration import (ScanRegistrationParams,
                                                   ScanToMapLoamRegistration)
from beam_slam_tpu.models.lidar_feature_extractor import LidarFeatureExtractor
from beam_slam_tpu.models.lidar_tracker import LidarTracker
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.solver.smoother import FixedLagSmoother, SmootherConfig

SCAN_PATH = "/root/reference/bs_models/tests/data/test_scan_vlp16.pcd"

pytestmark = pytest.mark.skipif(not os.path.exists(SCAN_PATH),
                                reason="real VLP-16 fixture not available")


@pytest.fixture(scope="module")
def real_cloud():
    return load_pcd(SCAN_PATH)


def grid_from_pose(pc, q, p):
    pts = np.asarray(lie.quat_rotate(
        lie.quat_conj(jnp.asarray(q))[None], pc.xyz - np.asarray(p)))
    return organize_scan(pts, pc.ring, pc.time, 16, 1800)


POSES = [
    (np.array([1.0, 0, 0, 0], np.float32), np.zeros(3, np.float32)),
    (np.asarray(lie.so3_exp_quat(jnp.asarray([0.0, 0.0, 0.04]))),
     np.array([0.3, -0.15, 0.03], np.float32)),
    (np.asarray(lie.so3_exp_quat(jnp.asarray([0.01, 0.0, 0.08]))),
     np.array([0.6, -0.3, 0.06], np.float32)),
]


def make_smoother():
    sm = FixedLagSmoother(SmootherConfig(
        lag_duration=100.0, max_states=8, max_rel_pose_factors=8,
        max_abs_pose_factors=8, max_imu_factors=8, max_prior_factors=4,
        max_gravity_factors=4, max_motion_factors=4, max_landmarks=4,
        max_reprojection_factors=4, max_idp_factors=4,
        solver=gn.SolverOptions(max_iterations=8)))
    sm.register_extrinsic("lidar", np.array([1, 0, 0, 0], np.float32),
                          np.zeros(3, np.float32))
    return sm


def test_lidar_tracker_produces_odometry_with_global_anchoring(real_cloud):
    """The tracker must produce local odometry AND absolute global-map
    anchors from the ActiveSubmap on real scan data."""
    rng = np.random.default_rng(5)
    # active submap: the real scan at identity (the global map's frame)
    grid0 = grid_from_pose(real_cloud, *POSES[0])
    sm_map = Submap(0.0, np.array([1, 0, 0, 0], np.float32), np.zeros(3))
    sm_map.add_lidar_keyframe(0.0, np.array([1, 0, 0, 0], np.float32),
                              np.zeros(3), feat.extract_features(grid0))
    active = ActiveSubmap()
    active.update_from_submap(sm_map)
    assert not active.empty

    reloc_requests = []
    smoother = make_smoother()
    tracker = LidarTracker(
        smoother, ScanToMapLoamRegistration(ScanRegistrationParams()),
        active_submap=active,
        reloc_request_cb=lambda *a: reloc_requests.append(a))
    tracker.params.reloc_request_period_s = 0.4
    tracker.initialize(0.0)

    for i, (q_gt, p_gt) in enumerate(POSES):
        stamp = 0.5 * float(i) + 0.5
        grid = grid_from_pose(real_cloud, q_gt, p_gt)
        if i == 0:
            q_seed, p_seed = q_gt, p_gt
        else:
            q_seed = np.asarray(lie.quat_mul(
                jnp.asarray(q_gt), lie.so3_exp_quat(jnp.asarray(
                    rng.standard_normal(3).astype(np.float32) * 0.01))))
            p_seed = p_gt + rng.standard_normal(3).astype(np.float32) * 0.05
        def finit(t, q=q_seed, p=p_seed):
            return q, p
        tracker.frame_initializer = finit
        assert tracker.process_scan(stamp, grid)

    assert len(tracker.odom_global) == 3
    assert len(tracker.odom_smooth) == 3
    smoother.run_once()  # drain the pending transactions into the graph
    # global anchoring happened (absolute factors vs the active submap)
    assert tracker.global_anchor_count >= 2
    assert int(smoother.arena_abs.active.sum()) >= 2
    # global odometry is accurate vs GT (anchored, not just relative)
    for (stamp, q, p), (q_gt, p_gt) in zip(tracker.odom_global, POSES):
        assert np.linalg.norm(p - p_gt) < 0.05, (p, p_gt)
    # reloc requests fired periodically
    assert len(reloc_requests) >= 2
    # the graph solves with both local + global factors
    assert np.isfinite(float(smoother.last_diagnostics.final_cost))


def test_lidar_tracker_without_active_submap_degrades_to_local(real_cloud):
    smoother = make_smoother()
    tracker = LidarTracker(
        smoother, ScanToMapLoamRegistration(ScanRegistrationParams()),
        active_submap=None)
    tracker.initialize(0.0)
    for i, (q_gt, p_gt) in enumerate(POSES[:2]):
        grid = grid_from_pose(real_cloud, q_gt, p_gt)
        tracker.frame_initializer = lambda t, q=q_gt, p=p_gt: (q, p)
        assert tracker.process_scan(0.5 * i + 0.5, grid)
    assert tracker.global_anchor_count == 0
    smoother.run_once()
    assert int(smoother.arena_abs.active.sum()) == 1  # first-scan prior only


def test_lidar_feature_extractor_publishes_measurements(real_cloud):
    grid = grid_from_pose(real_cloud, *POSES[0])
    out = []
    fe = LidarFeatureExtractor(publish_cb=out.append)
    meas = fe.process_pointcloud(1.5, grid)
    assert out == [meas]
    c = meas.counts()
    assert c["edge_strong"] > 30 and c["surf_weak"] > c["surf_strong"] > 50
    assert meas.frame_id == "lidar"


def test_active_submap_accessors(real_cloud):
    grid = grid_from_pose(real_cloud, *POSES[0])
    sm = Submap(0.0, np.array([1, 0, 0, 0], np.float32),
                np.array([1.0, 2.0, 0.0], np.float32))
    sm.add_lidar_keyframe(0.0, np.array([1, 0, 0, 0], np.float32),
                          np.array([1.0, 2.0, 0.0], np.float32),
                          feat.extract_features(grid))
    a = ActiveSubmap()
    assert a.empty
    a.update_from_submap(sm)
    e, ev, s, sv = a.get_loam_map()
    assert int(np.asarray(ev).sum()) > 30
    pts, valid = a.get_lidar_map()
    assert pts.shape[0] == e.shape[0] + s.shape[0]
    # visual map points round-trip + removal
    a.set_visual_map_points(np.array([[1, 2, 3], [4, 5, 6.0]]))
    X = a.get_visual_map_points_in_camera_frame(
        np.array([1, 0, 0, 0.0]), np.zeros(3))
    assert X.shape == (2, 3)
    a.remove_visual_map_point(0)
    assert len(a.get_visual_map_points()) == 1
