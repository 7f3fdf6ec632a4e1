"""Global mapper tests: submap partitioning/round-trip, ScanContext search,
loop-closure refinement, and the global pose graph — the mini end-to-end
global-mapping pattern of the reference suite
(global_map_refinement_tests.cpp:104-321: simulated multi-submap trajectory
from a real scan, assert pose recovery)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.global_mapping import scancontext as sc
from beam_slam_tpu.global_mapping.global_map import GlobalMap, GlobalMapParams
from beam_slam_tpu.global_mapping.reloc import (EuclideanCandidateSearch,
                                                LoamRelocRefinement,
                                                ScanContextCandidateSearch)
from beam_slam_tpu.global_mapping.submap import Submap
from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.models.global_mapper import GlobalMapper
from beam_slam_tpu.models.lidar_odometry import SlamChunk

SCENE = synthetic_structured_scene(n_rings=16, width=504)


def features_from(q_wl, p_wl):
    xyz = lie.quat_rotate(lie.quat_conj(jnp.asarray(q_wl))[None, None],
                          SCENE.xyz - jnp.asarray(p_wl))
    grid = SCENE._replace(
        xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0))
    return feat.extract_features(grid)


def chunk_at(stamp, q, p, with_features=True):
    return SlamChunk(stamp=stamp, q_wb=np.asarray(q, np.float32),
                     p_wb=np.asarray(p, np.float32),
                     features=features_from(q, p) if with_features else None)


def test_submap_partitioning_by_distance():
    gm = GlobalMap(GlobalMapParams(submap_size_m=5.0, loop_closure=False))
    for i, x in enumerate([0.0, 2.0, 4.0, 6.0, 8.0, 12.0]):
        gm.add_measurement(chunk_at(float(i), [1, 0, 0, 0],
                                    [x, 0, 0], with_features=False))
    # 0,2,4 in submap 0 (origin 0); 6,8 in submap 1 (origin 6); 12 in submap 2
    assert len(gm.submaps) == 3
    assert len(gm.submaps[0].lidar_keyframes) == 0  # no features attached


def test_submap_save_load_roundtrip(tmp_path):
    sm = Submap(1.5, np.array([1, 0, 0, 0], np.float32),
                np.array([1.0, 2.0, 0.5], np.float32))
    fc = features_from([1, 0, 0, 0], [0, 0, 0])
    sm.add_lidar_keyframe(1.6, np.array([1, 0, 0, 0]), np.array([1.2, 2, 0.5]),
                          fc)
    sm.add_subframe_pose(1.55, np.array([1, 0, 0, 0]),
                         np.array([1.1, 2, 0.5]))
    d = str(tmp_path / "submap0")
    sm.save(d)
    sm2 = Submap.load(d)
    assert sm2.stamp == sm.stamp
    np.testing.assert_allclose(sm2.p, sm.p)
    assert len(sm2.lidar_keyframes) == 1
    np.testing.assert_allclose(
        np.asarray(sm2.lidar_keyframes[0].features.edge_strong),
        np.asarray(fc.edge_strong), atol=0)
    assert len(sm2.subframe_poses) == 1


# ScanContext tuned to the synthetic room scale (the production default of
# 80 m is for outdoor scans; an 8 m room would collapse into 2 rings)
SC_CFG = sc.ScanContextConfig(n_rings=12, n_sectors=60, max_range=14.0)


def _sc_points(fc):
    pts = jnp.concatenate([fc.edge_strong, fc.edge_weak, fc.surf_strong,
                           fc.surf_weak])
    valid = jnp.concatenate([fc.edge_strong_valid, fc.edge_weak_valid,
                             fc.surf_strong_valid, fc.surf_weak_valid])
    return pts, valid


def test_scancontext_distance_properties(rng):
    pts, valid = _sc_points(features_from([1, 0, 0, 0], [0, 0, 0]))
    d1 = sc.make_descriptor(pts, valid, SC_CFG)
    assert int((np.asarray(d1) != 0).sum()) > 50  # well-populated
    # same scan → distance ~0
    dist, shift = sc.distance(d1, d1)
    assert float(dist) < 1e-5 and int(shift) == 0
    # yaw-rotated scan → small distance at the compensating shift
    q_rot = lie.so3_exp_quat(jnp.asarray([0.0, 0.0, np.pi / 6], jnp.float32))
    pts_rot = lie.quat_rotate(q_rot[None], pts)
    d2 = sc.make_descriptor(pts_rot, valid, SC_CFG)
    dist_r, shift_r = sc.distance(d1, d2)
    assert float(dist_r) < 0.2, float(dist_r)
    assert int(shift_r) != 0
    # a different viewpoint across the room → clearly larger distance
    pts3, valid3 = _sc_points(features_from([1, 0, 0, 0], [5.0, 4.0, 0.0]))
    d3 = sc.make_descriptor(pts3, valid3, SC_CFG)
    dist_far, _ = sc.distance(d1, d3)
    assert float(dist_far) > float(dist_r) + 0.05, \
        (float(dist_far), float(dist_r))


def test_loop_closure_corrects_drift():
    """Simulated drift: the robot returns to the start but the odometry says
    otherwise; loop closure must find the match and the pose graph must
    correct the chain (RunLoopClosure → loop factor → optimize)."""
    params = GlobalMapParams(submap_size_m=3.0, loop_closure=True,
                             candidate_search="EUCDIST", max_candidates=1)
    gm_model = GlobalMapper(params)
    gm_model.map.candidate_search = EuclideanCandidateSearch(
        max_distance_m=6.0, skip_recent=1)

    # true poses: out along x and back (loop), with injected drift on return.
    # The *scan* is what the sensor truly saw (rendered at the true pose);
    # the odometry pose carries the drift — that mismatch is the loop signal.
    xs = [0.0, 2.0, 4.0, 6.0, 6.0, 4.0, 2.0, 0.0]
    ys = [0.0, 0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 2.0]
    drift = np.linspace(0, 0.4, len(xs))
    for i, (x, y) in enumerate(zip(xs, ys)):
        p_true = np.array([x, y, 0.0], np.float32)
        p_odom = p_true + np.array([0.0, drift[i], 0.0], np.float32)
        chunk = chunk_at(float(i), [1, 0, 0, 0], p_true)
        chunk = chunk._replace(p_wb=p_odom)
        gm_model.process_slam_chunk(chunk)
    # force final submap completion + loop closure on the last submap
    n_sub = len(gm_model.map.submaps)
    assert n_sub >= 3
    from beam_slam_tpu.solver.smoother import Transaction
    txn = Transaction(stamp=100.0)
    found = gm_model.map.run_loop_closure(n_sub - 1, txn)
    if found:
        gm_model.smoother.send_transaction(txn)
        gm_model.optimize()
    total = gm_model.n_loop_closures + found
    assert total >= 1, "no loop closures found"
    # the final submap pose must be pulled back toward truth
    last = gm_model.map.submaps[-1]
    # its odometric y had ~0.3-0.4 m drift; after PGO it must shrink
    y_err = abs(last.p[1] - ys[-2 if last.stamp == 6.0 else -1])
    assert y_err < 0.25, (last.p, y_err)


def test_global_map_save_load(tmp_path):
    gm = GlobalMap(GlobalMapParams(submap_size_m=4.0, loop_closure=False))
    for i, x in enumerate([0.0, 5.0, 10.0]):
        gm.add_measurement(chunk_at(float(i), [1, 0, 0, 0], [x, 0, 0]))
    d = str(tmp_path / "gmap")
    gm.save(d)
    gm2 = GlobalMap.load(d)
    assert len(gm2.submaps) == len(gm.submaps)
    np.testing.assert_allclose(gm2.submaps[1].p, gm.submaps[1].p)
    assert len(gm2.submaps[0].lidar_keyframes) == \
        len(gm.submaps[0].lidar_keyframes)


def test_submap_landmark_container_roundtrip(tmp_path):
    """Submap landmark storage (submap.h landmark container): world→submap
    frame conversion, world exports reflecting pose updates, save/load."""
    import jax.numpy as jnp
    from beam_slam_tpu.core import lie

    q_ws = np.asarray(lie.so3_exp_quat(jnp.asarray([0, 0, 0.3])), np.float32)
    p_ws = np.array([2.0, 1.0, 0.0], np.float32)
    sm = Submap(1.0, q_ws, p_ws)
    X1 = np.array([5.0, 2.0, 1.0], np.float32)
    X2 = np.array([6.0, 3.0, -1.0], np.float32)
    sm.add_landmark(7, X1, word=42)
    sm.add_landmark(9, X2)
    out = sm.landmarks_world()
    np.testing.assert_allclose(out, np.stack([X1, X2]), atol=1e-5)
    # submap pose update moves the world-frame landmarks rigidly
    sm.p = p_ws + np.array([1.0, 0, 0], np.float32)
    out2 = sm.landmarks_world()
    np.testing.assert_allclose(out2 - out, 1.0 * np.array([[1, 0, 0]] * 2),
                               atol=1e-5)
    d = str(tmp_path / "sm")
    sm.save(d)
    sm2 = Submap.load(d)
    assert set(sm2.landmarks) == {7, 9}
    assert sm2.landmark_words == {7: 42}
    np.testing.assert_allclose(sm2.landmarks[7], sm.landmarks[7], atol=1e-6)


def test_global_map_routes_chunk_landmarks():
    from beam_slam_tpu.models.lidar_odometry import SlamChunk

    gm = GlobalMap(GlobalMapParams(submap_size_m=100.0, loop_closure=False))
    chunk = SlamChunk(
        stamp=0.0, q_wb=np.array([1, 0, 0, 0], np.float32),
        p_wb=np.zeros(3, np.float32),
        landmarks=((3, np.array([1.0, 2, 3], np.float32)),
                   (5, np.array([4.0, 5, 6], np.float32))))
    gm.add_measurement(chunk)
    assert set(gm.submaps[0].landmarks) == {3, 5}
    # active submap publishes them as world-frame visual map points
    from beam_slam_tpu.global_mapping.active_submap import ActiveSubmap
    a = ActiveSubmap()
    a.update_from_submap(gm.submaps[0])
    np.testing.assert_allclose(
        sorted(a.get_visual_map_points().tolist()),
        [[1, 2, 3], [4, 5, 6]], atol=1e-5)


def test_global_map_params_from_reference_json():
    import os
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs",
                           "global_map")
    p = GlobalMapParams.from_json(os.path.join(cfg_dir, "global_map.json"))
    assert p.submap_size_m == 10.0
    assert p.loop_closure is True
    assert p.candidate_search == "EUCDIST"
    assert abs(p.loop_closure_cov - 1e-5) < 1e-12
    p2 = GlobalMapParams.from_json(dict(disable_loop_closure=True,
        loop_closure_candidate_search=dict(type="SCANCONTEXT",
                                           scan_context_dist_thres=0.25)))
    assert p2.loop_closure is False
    assert p2.candidate_search == "SCANCONTEXT"
    assert p2.sc_dist_threshold == 0.25


def test_vo_params_from_reference_json():
    import os
    from beam_slam_tpu.models.visual_odometry import VOParams
    p = VOParams.from_json(os.path.join(
        os.path.dirname(__file__), "..", "configs", "vo", "vo_params.json"))
    assert p.landmark_type == "EUC"
    assert p.max_triangulation_reproj_px == 5.0
    p2 = VOParams.from_json(dict(use_idp=True, standalone_vo=True))
    assert p2.landmark_type == "IDP" and p2.standalone


def test_global_map_from_config_with_subconfig_files():
    """global_map.json with candidate-search / refinement sub-config FILE
    references builds the right objects (the *_config path tier of the
    reference's global_map.json)."""
    from beam_slam_tpu.global_mapping.global_map import global_map_from_config
    from beam_slam_tpu.global_mapping.reloc import (EuclideanCandidateSearch,
                                                    LoamRelocRefinement)

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    gm = global_map_from_config(dict(
        submap_size_m=7,
        loop_closure_candidate_search_config=(
            "global_map/reloc_candidate_search_eucdist.json"),
        loop_closure_refinement_config=(
            "global_map/reloc_refinement_loam_registration.json"),
    ), config_root=root)
    assert gm.params.submap_size_m == 7
    assert isinstance(gm.candidate_search, EuclideanCandidateSearch)
    assert gm.candidate_search.max_distance_m == 3.0
    assert isinstance(gm.refinement, LoamRelocRefinement)
    assert gm.refinement.reg_cfg.max_corr_dist > 0


def test_submap_time_queries_and_updates():
    """Near/InSubmap/FindT_SUBMAP_KEYFRAME and the update counter
    (submap.h:217-231, :128, :289-295)."""
    sm = Submap(0.0, np.array([1, 0, 0, 0], np.float32),
                np.zeros(3, np.float32))
    for t in (1.0, 2.0, 3.0):
        sm.add_lidar_keyframe(t, np.array([1, 0, 0, 0], np.float32),
                              np.array([t, 0, 0], np.float32),
                              features_from([1, 0, 0, 0], [t, 0, 0]))
    sm.add_subframe_pose(2.5, np.array([1, 0, 0, 0], np.float32),
                         np.array([2.5, 0, 0], np.float32))
    assert sm.near(1.05, 0.1) and not sm.near(1.05, 0.01)
    assert sm.in_submap(2.2) and not sm.in_submap(3.5)
    got = sm.find_T_submap_keyframe(2.0)
    assert got is not None
    np.testing.assert_allclose(got[1], [2.0, 0, 0], atol=1e-5)
    assert sm.find_T_submap_keyframe(9.9) is None
    assert sm.updates == 0
    sm.update_pose(np.array([1, 0, 0, 0], np.float32),
                   np.array([0.1, 0, 0], np.float32))
    assert sm.updates == 1
    # use_initials exports reflect the pre-update pose
    t0 = sm.trajectory_world(use_initials=True)
    t1 = sm.trajectory_world()
    np.testing.assert_allclose(t1[0][2] - t0[0][2], [0.1, 0, 0], atol=1e-5)


def test_submap_triangulate_keypoints():
    """TriangulateKeypoints (submap.h:470): recover a known 3D point from
    two camera keyframes' pixel observations."""
    sm = Submap(0.0, np.array([1, 0, 0, 0], np.float32),
                np.zeros(3, np.float32))
    fx = fy = 400.0
    cx = cy = 320.0
    X = np.array([0.5, -0.2, 4.0], np.float32)  # submap frame
    for i, origin in enumerate([np.zeros(3), np.array([1.0, 0, 0])]):
        d = X - origin.astype(np.float32)
        u = fx * d[0] / d[2] + cx
        v = fy * d[1] / d[2] + cy
        sm.add_camera_keyframe(float(i), np.array([1, 0, 0, 0], np.float32),
                               origin.astype(np.float32),
                               ids=np.array([7]),
                               pixels=np.array([[u, v]], np.float32))
    n = sm.triangulate_keypoints((fx, fy, cx, cy))
    assert n == 1
    np.testing.assert_allclose(sm.landmarks[7], X, atol=1e-3)
    # override=False keeps the existing point
    sm.landmarks[7] = np.zeros(3, np.float32)
    assert sm.triangulate_keypoints((fx, fy, cx, cy)) == 0
    assert sm.triangulate_keypoints((fx, fy, cx, cy), override=True) == 1
    np.testing.assert_allclose(sm.landmarks[7], X, atol=1e-3)


def test_global_map_artifact_exports(tmp_path):
    """World-frame export suite (global_map.h:287-326)."""
    from beam_slam_tpu.obs.artifacts import read_ply, read_trajectory_tum

    gm = GlobalMap(GlobalMapParams(submap_size_m=5.0, loop_closure=False))
    for i, x in enumerate([0.0, 2.0, 6.0]):
        gm.add_measurement(chunk_at(float(i), [1, 0, 0, 0], [x, 0, 0]))
    gm.submaps[0].add_landmark(1, np.array([0.0, 1.0, 2.0], np.float32))
    d = str(tmp_path)
    gm.save_lidar_submaps(os.path.join(d, "lidar"), save_initial=True)
    gm.save_keypoint_submaps(os.path.join(d, "keypoints"))
    gm.save_trajectory_file(os.path.join(d, "traj.txt"))
    gm.save_trajectory_clouds(os.path.join(d, "traj.ply"))
    gm.save_submap_frames(os.path.join(d, "frames.ply"))
    assert os.path.exists(os.path.join(d, "lidar", "lidar_submap0000.ply"))
    assert os.path.exists(os.path.join(
        d, "lidar", "lidar_submap0000_initial.ply"))
    assert len(read_ply(os.path.join(
        d, "keypoints", "keypoints_submap0000.ply"))) == 1
    traj = read_trajectory_tum(os.path.join(d, "traj.txt"))
    assert len(traj) == 3
    assert os.path.exists(os.path.join(d, "traj_initial.txt"))
    assert len(read_ply(os.path.join(d, "frames.ply"))) == 30 * 2
