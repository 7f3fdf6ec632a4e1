"""Offline refinement pipeline tests (mini end-to-end pattern of
global_map_refinement_tests.cpp:104-321: simulated multi-submap trajectory,
run refinement stages, assert pose recovery) + the CLI round-trip."""

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.global_mapping import refinement
from beam_slam_tpu.global_mapping.global_map import GlobalMap, GlobalMapParams
from beam_slam_tpu.global_mapping.submap import Submap
from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.parallel import sharded

SCENE = synthetic_structured_scene(n_rings=16, width=504)


def features_from(p_wl, q_wl=None):
    q_wl = jnp.asarray([1.0, 0, 0, 0]) if q_wl is None else jnp.asarray(q_wl)
    xyz = lie.quat_rotate(lie.quat_conj(q_wl)[None, None],
                          SCENE.xyz - jnp.asarray(p_wl, jnp.float32))
    return feat.extract_features(
        SCENE._replace(xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0)))


def build_noisy_map(rng, n_submaps=2, kf_per_submap=4, noise=0.08):
    """Submaps whose keyframe poses are perturbed from truth; scans rendered
    at the TRUE poses so refinement has signal."""
    gm = GlobalMap(GlobalMapParams(submap_size_m=100.0, loop_closure=False))
    truth = {}
    for s in range(n_submaps):
        origin = np.array([2.0 * s, 0.0, 0.0], np.float32)
        sm = Submap(float(s * 10), np.array([1, 0, 0, 0], np.float32), origin)
        for k in range(kf_per_submap):
            p_true = origin + np.array([0.5 * k, 0.3 * (k % 2), 0.0],
                                       np.float32)
            fc = features_from(p_true)
            p_noisy = p_true + rng.standard_normal(3).astype(np.float32) * noise
            # submap stores poses relative to its own frame
            sm.add_lidar_keyframe(s * 10 + k, np.array([1, 0, 0, 0]),
                                  p_noisy, fc)
            truth[(s, k)] = p_true - origin  # submap-frame truth
        gm.submaps.append(sm)
    return gm, truth


def _submap_errors(gm, truth, demean=False):
    """Per-keyframe position errors vs truth; with ``demean`` the per-submap
    mean offset is removed first — the common mode of a submap's keyframes is
    unobservable to within-submap refinement (it is the submap pose itself),
    so relative consistency is the meaningful metric."""
    errs = []
    for s, sm in enumerate(gm.submaps):
        d = np.stack([kf.p - truth[(s, k)]
                      for k, kf in enumerate(sm.lidar_keyframes)])
        if demean:
            d = d - d.mean(axis=0, keepdims=True)
        errs.extend(np.linalg.norm(d, axis=1))
    return np.asarray(errs)


def test_submap_refinement_recovers_keyframe_poses(rng):
    gm, truth = build_noisy_map(rng)
    before = _submap_errors(gm, truth, demean=True)
    refinement.run_submap_refinement(gm)
    after = _submap_errors(gm, truth, demean=True)
    assert before.mean() > 0.04
    assert after.mean() < before.mean() * 0.4, (before.mean(), after.mean())
    assert after.max() < 0.05, after


def test_submap_refinement_sharded_over_mesh(rng):
    """The same refinement distributed over the 8-device CPU mesh must give
    the same result as the local path."""
    gm_a, truth = build_noisy_map(rng, n_submaps=2)
    gm_b, _ = build_noisy_map(np.random.default_rng(42), n_submaps=2)
    mesh = sharded.make_mesh(2)
    refinement.run_submap_refinement(gm_a)
    refinement.run_submap_refinement(gm_b, mesh=mesh)
    for sm_a, sm_b in zip(gm_a.submaps, gm_b.submaps):
        for kf_a, kf_b in zip(sm_a.lidar_keyframes, sm_b.lidar_keyframes):
            np.testing.assert_allclose(kf_a.p, kf_b.p, atol=1e-4)


def test_batch_optimization_closes_loop(rng):
    """Out-and-back keyframe trajectory with odometric drift: the batch
    stage must find the ScanContext loop, keep it past outlier rejection,
    and pull the return leg back toward truth."""
    from beam_slam_tpu.global_mapping.global_map import (GlobalMap,
                                                         GlobalMapParams)
    from beam_slam_tpu.global_mapping.submap import Submap
    gm = GlobalMap(GlobalMapParams(submap_size_m=100.0, loop_closure=False))
    sm = Submap(0.0, np.array([1, 0, 0, 0], np.float32),
                np.zeros(3, np.float32))
    # out along x and back; drift grows on the way back
    xs = [0.0, 1.5, 3.0, 4.5, 4.5, 3.0, 1.5, 0.0]
    ys = [0.0, 0.0, 0.0, 0.0, 1.5, 1.5, 1.5, 1.5]
    drift = np.linspace(0, 0.5, len(xs)).astype(np.float32)
    truth = []
    for i, (x, y) in enumerate(zip(xs, ys)):
        p_true = np.array([x, y, 0.0], np.float32)
        p_odom = p_true + np.array([0.0, drift[i], 0.0], np.float32)
        fc = features_from(p_true)  # scans see the truth
        sm.add_lidar_keyframe(float(i * 3), np.array([1, 0, 0, 0]),
                              p_odom, fc)
        truth.append(p_true)
    gm.submaps.append(sm)

    stats = refinement.run_batch_optimization(
        gm, refinement.BatchOptimizationParams(loop_min_separation_s=8.0))
    assert stats["loops_kept"] >= 1, stats
    errs = [np.linalg.norm(kf.p - truth[i])
            for i, kf in enumerate(sm.lidar_keyframes)]
    assert errs[-1] < 0.25, (errs, stats)   # drift was 0.5 at the end


def test_refinement_cli_roundtrip(tmp_path, rng):
    gm, _ = build_noisy_map(rng, n_submaps=2, kf_per_submap=3)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    gm.save(in_dir)
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/global_map_refinement_main.py",
         "--globalmap_dir", in_dir, "--output_path", out_dir,
         "--run_submap_refinement", "--cpu"],
        capture_output=True, text=True, timeout=500, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    gm2 = GlobalMap.load(out_dir)
    assert len(gm2.submaps) == 2
    import json
    with open(out_dir + "/refinement_stats.json") as f:
        stats = json.load(f)
    assert "refinement_cost" in stats


def test_refinement_params_from_json():
    """global_map_refinement.json loads into both param structs (the
    reference's gflags+JSON CLI config path)."""
    import os

    from beam_slam_tpu.global_mapping.refinement import (
        BatchOptimizationParams, RefinementParams)

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    path = os.path.join(root, "global_map", "global_map_refinement.json")
    p = RefinementParams.from_json(path, config_root=root)
    assert p.prior_cov == 1e-3
    assert p.registration_cov == 1e-4
    assert p.scan_registration_cfg.max_corr_dist > 0
    b = BatchOptimizationParams.from_json(path, config_root=root)
    assert b.sc_max_distance == 0.35
    assert b.max_loop_candidates_per_kf == 2
    assert b.loop_min_separation_s == 5.0
