"""Lidar pipeline tests — the perturbed-scan registration pattern of the
reference suite (multi_scan_registration_tests.cpp:31-90: synthesize poses,
transform the cloud, perturb the initial estimate, assert recovery), using a
synthetic structured scene in place of the VLP-16 PCD fixture."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import deskew as dsk
from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar import registration as reg
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.lidar.registration_map import RegistrationMap
from beam_slam_tpu.lidar.scan_registration import (ScanRegistrationParams,
                                                   ScanToMapLoamRegistration)
from beam_slam_tpu.solver.smoother import Transaction


@pytest.fixture(scope="module")
def scene():
    return synthetic_structured_scene(n_rings=16, width=504 // 8 * 8 * 8 // 7)


def _scene():
    # width divisible by 6 sectors: 504
    return synthetic_structured_scene(n_rings=16, width=504)


def test_feature_extraction_finds_structure():
    grid = _scene()
    fc = feat.extract_features(grid, feat.LoamConfig())
    # enough features of each class
    assert int(fc.surf_strong_valid.sum()) > 100
    assert int(fc.edge_strong_valid.sum()) > 4

    # strong surfaces lie on the walls (one coordinate at its wall value)
    s = np.asarray(fc.surf_strong)[np.asarray(fc.surf_strong_valid)]
    on_wall = (
        (np.abs(np.abs(s[:, 0]) - 8.0) < 0.05)
        | (np.abs(np.abs(s[:, 1]) - 6.0) < 0.05)
        | (np.abs(np.abs(s[:, 2]) - 2.5) < 0.05))
    assert on_wall.mean() > 0.95, on_wall.mean()

    # strong edges cluster near pole silhouettes or wall corners
    e = np.asarray(fc.edge_strong)[np.asarray(fc.edge_strong_valid)]
    poles = np.array([[3.0, 2.0], [-2.0, 3.5], [4.0, -3.0], [-5.0, -2.0]])
    d_pole = np.min(np.linalg.norm(
        e[:, None, :2] - poles[None], axis=2), axis=1)
    near_corner = (np.abs(np.abs(e[:, 0]) - 8.0) < 0.3) | \
                  (np.abs(np.abs(e[:, 1]) - 6.0) < 0.3)
    assert ((d_pole < 0.5) | near_corner).mean() > 0.8


def test_deskew_identity():
    grid = _scene()
    q = lie.quat_identity()
    p = jnp.zeros(3)
    out = dsk.deskew(grid, q, p, q, p, 0.0, 0.1)
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(grid.xyz),
                               atol=1e-5)


def test_deskew_removes_known_motion():
    """Distort a static scan with a known intra-scan motion, then deskew with
    that motion — must recover the original points."""
    grid = _scene()
    q0 = lie.quat_identity()
    p0 = jnp.zeros(3)
    q1 = lie.so3_exp_quat(jnp.asarray([0.0, 0.0, 0.05], jnp.float32))
    p1 = jnp.asarray([0.3, 0.1, 0.0], jnp.float32)

    # forward-distort: point captured at time t was seen from pose T(t);
    # its recorded coordinates are T(t)⁻¹ · p_world (scan frame at capture).
    s = jnp.clip(grid.time / 0.1, 0.0, 1.0)
    q_t = dsk.slerp(q0, q1, s)
    p_t = p0 + s[..., None] * (p1 - p0)
    distorted = lie.quat_rotate(
        lie.quat_conj(q_t), grid.xyz - p_t)
    distorted = jnp.where(grid.valid[..., None], distorted, 0.0)
    dist_grid = grid._replace(xyz=distorted)

    out = dsk.deskew(dist_grid, q0, p0, q1, p1, 0.0, 0.1)
    err = np.abs(np.asarray(out.xyz) - np.asarray(grid.xyz))
    err = err[np.asarray(grid.valid)]
    assert err.max() < 1e-3, err.max()


def _features_of_transformed_scene(q, p):
    """Scene as observed from pose (q, p): scan-frame points T⁻¹·world."""
    grid = _scene()
    xyz = lie.quat_rotate(lie.quat_conj(q)[None, None], grid.xyz - p)
    xyz = jnp.where(grid.valid[..., None], xyz, 0.0)
    return feat.extract_features(grid._replace(xyz=xyz))


def test_registration_recovers_perturbed_pose():
    grid = _scene()
    fc0 = feat.extract_features(grid)
    m = RegistrationMap(map_size=5)
    m.add_scan(0.0, lie.quat_identity(), jnp.zeros(3), fc0)
    me, mev, ms, msv = m.world_frame()

    # true pose of scan 2
    q_true = lie.so3_exp_quat(jnp.asarray([0.02, -0.03, 0.08], jnp.float32))
    p_true = jnp.asarray([0.4, -0.25, 0.1], jnp.float32)
    fc2 = _features_of_transformed_scene(q_true, p_true)

    # perturbed seed
    q_seed = lie.quat_mul(q_true, lie.so3_exp_quat(
        jnp.asarray([0.03, 0.02, -0.04], jnp.float32)))
    p_seed = p_true + jnp.asarray([-0.12, 0.1, 0.05], jnp.float32)

    res = reg.register_loam(fc2, me, mev, ms, msv, q_seed, p_seed,
                            reg.LoamRegistrationConfig(iterations=10))
    assert bool(res.converged)
    assert float(jnp.linalg.norm(res.p - p_true)) < 0.02
    dth = lie.so3_log(lie.quat_mul(lie.quat_conj(res.q), q_true))
    assert float(jnp.linalg.norm(dth)) < 0.02
    assert int(res.n_inliers) > 200


def test_scan_to_map_strategy_emits_chained_factors():
    strat = ScanToMapLoamRegistration(
        ScanRegistrationParams(fix_first_scan=True), map_size=5)
    poses = [
        (lie.quat_identity(), jnp.zeros(3, jnp.float32)),
        (lie.so3_exp_quat(jnp.asarray([0, 0, 0.05], jnp.float32)),
         jnp.asarray([0.3, 0.0, 0.0], jnp.float32)),
        (lie.so3_exp_quat(jnp.asarray([0, 0, 0.1], jnp.float32)),
         jnp.asarray([0.6, 0.1, 0.0], jnp.float32)),
    ]
    txn = Transaction()
    for i, (q, p) in enumerate(poses):
        fc = _features_of_transformed_scene(q, p)
        # mildly perturbed seed for scans after the first
        if i > 0:
            q_seed = lie.quat_mul(q, lie.so3_exp_quat(
                jnp.asarray([0.01, -0.01, 0.02], jnp.float32)))
            p_seed = p + jnp.asarray([0.05, -0.04, 0.02], jnp.float32)
        else:
            q_seed, p_seed = q, p
        ok = strat.register_new_scan(float(i) * 0.1, fc, q_seed, p_seed, txn)
        assert ok

    assert len(txn.abs_poses) == 1      # first-scan prior
    assert len(txn.rel_poses) == 2      # chained factors
    assert txn.rel_poses[0].sensor == "lidar"
    # measured deltas close to GT deltas
    for i, f in enumerate(txn.rel_poses):
        q_a, p_a = poses[i]
        q_b, p_b = poses[i + 1]
        dq_gt = lie.quat_mul(lie.quat_conj(q_a), q_b)
        dp_gt = lie.quat_rotate(lie.quat_conj(q_a), p_b - p_a)
        assert np.linalg.norm(f.dp - np.asarray(dp_gt)) < 0.03
        dth = lie.so3_log(lie.quat_mul(lie.quat_conj(jnp.asarray(f.dq)),
                                       dq_gt))
        assert float(jnp.linalg.norm(dth)) < 0.02
    assert len(strat.map) == 3


def test_radius_moment_registration_converges():
    """Experimental matmul-based fixed-radius correspondence mode
    (LoamRegistrationConfig.corr_mode="radius"): registers the synthetic
    scene to sub-cm from a cm-level seed. kNN stays the default (see the
    config docstring for the measured comparison)."""
    import jax.numpy as jnp
    from beam_slam_tpu.core import lie
    from beam_slam_tpu.lidar import features as feat
    from beam_slam_tpu.lidar import registration as reg
    from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
    from beam_slam_tpu.lidar.registration_map import RegistrationMap

    world = synthetic_structured_scene(n_rings=16, width=504)
    fc = feat.extract_features(world)
    rmap = RegistrationMap(map_size=5)
    rmap.add_scan(0.0, jnp.asarray([1.0, 0, 0, 0]),
                  jnp.zeros(3, jnp.float32), fc)
    me, mev, ms, msv = rmap.world_frame()
    q_true = lie.so3_exp_quat(jnp.asarray([0.02, -0.03, 0.04]))
    p_true = jnp.asarray([0.1, -0.05, 0.08])
    xyz = lie.quat_rotate(lie.quat_conj(q_true)[None, None],
                          world.xyz - p_true)
    fc_s = feat.extract_features(world._replace(
        xyz=jnp.where(world.valid[..., None], xyz, 0.0)))
    cfg = reg.LoamRegistrationConfig(iterations=8, corr_mode="radius")
    q0 = lie.quat_mul(q_true, lie.so3_exp_quat(jnp.asarray([0.008, -0.006,
                                                            0.004])))
    p0 = p_true + jnp.asarray([0.04, -0.03, 0.02])
    res = reg.register_loam(fc_s, me, mev, ms, msv, q0, p0, cfg)
    assert bool(res.converged)
    import numpy as np
    assert float(np.linalg.norm(np.asarray(res.p) - np.asarray(p_true))) \
        < 0.02
