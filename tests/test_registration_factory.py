"""Registration/matcher config factory + lidar input-filter tier.

Mirrors ScanRegistrationBase::Create (scan_registration_base.cpp:40-97):
registration_type MULTISCAN|SCANTOMAP x matcher_type LOAM|ICP|GICP|NDT
selected purely from JSON config, and the input-filter chain of
lidar_odometry.cpp:37-45 (beam_slam_launch/config/lidar_filters/*)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import filters as lfil
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.lidar.scan_registration import (
    MultiScanLoamRegistration, MultiScanMatcherRegistration,
    ScanToMapLoamRegistration, create_scan_registration)
from beam_slam_tpu.solver.smoother import Transaction

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("reg_json,matcher_json,expected_type,mtype", [
    ("registration/scan_to_map.json", "matchers/loam_vlp16.json",
     ScanToMapLoamRegistration, "LOAM"),
    ("registration/multi_scan.json", "matchers/loam_vlp16.json",
     MultiScanLoamRegistration, "LOAM"),
    ("registration/multi_scan.json", "matchers/icp.json",
     MultiScanMatcherRegistration, "ICP"),
    ("registration/multi_scan.json", "matchers/gicp.json",
     MultiScanMatcherRegistration, "GICP"),
    ("registration/multi_scan.json", "matchers/ndt.json",
     MultiScanMatcherRegistration, "NDT"),
])
def test_factory_creates_each_combination(reg_json, matcher_json,
                                          expected_type, mtype):
    strategy, feat_cfg = create_scan_registration(
        reg_json, matcher_json, config_root=CONFIG_ROOT)
    assert isinstance(strategy, expected_type)
    if mtype == "LOAM":
        assert feat_cfg is not None  # LOAM needs the feature extractor cfg
    else:
        assert strategy.matcher_type == mtype


def test_factory_rejects_scan_to_map_with_generic_matcher():
    with pytest.raises(ValueError):
        create_scan_registration("registration/scan_to_map.json",
                                 "matchers/icp.json",
                                 config_root=CONFIG_ROOT)


@pytest.mark.parametrize("matcher_json", ["matchers/icp.json",
                                          "matchers/gicp.json"])
def test_generic_matcher_registration_recovers_motion(matcher_json):
    """The matcher runs inside the MultiScan registration loop: two scans of
    the same scene from different poses must yield a relative-pose factor
    matching the ground-truth motion (the reference's perturbed-registration
    test pattern, multi_scan_registration_tests.cpp)."""
    strategy, _ = create_scan_registration(
        "registration/multi_scan.json", matcher_json,
        config_root=CONFIG_ROOT)
    world = synthetic_structured_scene(n_rings=16, width=504)

    def scan_from(q_wb, p_wb):
        # sensor-frame points of the world scene seen from pose (q_wb, p_wb)
        pts = lie.quat_rotate(lie.quat_conj(q_wb)[None],
                              world.xyz.reshape(-1, 3) - p_wb[None])
        return world._replace(xyz=pts.reshape(world.xyz.shape))

    q0 = lie.quat_identity()
    p0 = jnp.zeros(3)
    q1 = lie.so3_exp_quat(jnp.asarray([0.02, -0.01, 0.05], jnp.float32))
    p1 = jnp.asarray([0.3, -0.2, 0.05], jnp.float32)

    txn = Transaction(stamp=0.0)
    assert strategy.register_new_scan(0.0, None, q0, p0, txn,
                                      grid=scan_from(q0, p0))
    txn = Transaction(stamp=0.5)
    # seed slightly off the true pose
    q_seed = lie.quat_mul(q1, lie.so3_exp_quat(
        jnp.asarray([0.01, 0.01, -0.01], jnp.float32)))
    p_seed = p1 + jnp.asarray([0.05, -0.05, 0.02], jnp.float32)
    assert strategy.register_new_scan(0.5, None, q_seed, p_seed, txn,
                                      grid=scan_from(q1, p1))
    assert len(txn.rel_poses) == 1
    f = txn.rel_poses[0]
    dp_true = np.asarray(lie.quat_rotate(lie.quat_conj(q0), p1 - p0))
    assert np.linalg.norm(f.dp - dp_true) < 0.1, (f.dp, dp_true)
    dq_err = lie.quat_mul(lie.quat_conj(jnp.asarray(f.dq)),
                          lie.quat_mul(lie.quat_conj(q0), q1))
    assert np.linalg.norm(np.asarray(lie.so3_log(dq_err))) < 0.05


def test_cropbox_filters_mask_points():
    # the shipped config parses to the reference's two-box chain
    chain = lfil.load_filters(os.path.join(
        CONFIG_ROOT, "lidar_filters", "input_filters_cropbox.json"))
    assert len(chain) == 2
    assert chain[0].remove_outside_points is False
    # boxes sized to actually intersect the synthetic scene
    grid = synthetic_structured_scene(n_rings=16, width=504)
    chain = [
        lfil.CropBoxFilter(min=(0.0, 0.0, -5.0), max=(6.0, 6.0, 5.0),
                           remove_outside_points=False),   # cut this octant
        lfil.CropBoxFilter(min=(-8.0, -8.0, -8.0), max=(8.0, 8.0, 8.0),
                           remove_outside_points=True),    # bound range
    ]
    out = lfil.apply_filters(grid, chain)
    xyz = np.asarray(grid.xyz)
    v_in = np.asarray(grid.valid)
    v_out = np.asarray(out.valid)
    assert v_out.sum() < v_in.sum()
    inside = np.all((xyz >= [0, 0, -5]) & (xyz <= [6, 6, 5]), axis=-1)
    assert not np.any(v_out & inside)
    outside = np.any((xyz < -8) | (xyz > 8), axis=-1)
    assert not np.any(v_out & outside)
    assert np.any(v_in & inside), "scene must intersect the cut box"


def test_voxel_filter_downsamples():
    grid = synthetic_structured_scene(n_rings=16, width=504)
    out = lfil.apply_filters(grid, [lfil.VoxelDownsampleFilter(0.5)])
    n_in = int(np.asarray(grid.valid).sum())
    n_out = int(np.asarray(out.valid).sum())
    assert 0 < n_out < n_in
    # survivors are unique per voxel
    pts = np.asarray(grid.xyz)[np.asarray(out.valid)]
    cells = np.floor(pts / 0.5).astype(np.int64)
    uniq = np.unique(cells, axis=0)
    assert len(uniq) == len(cells)


def test_lio_yaml_loads_subconfig_tier():
    from beam_slam_tpu.pipeline.config import LocalMapperConfig
    cfg = LocalMapperConfig.from_yaml(
        os.path.join(CONFIG_ROOT, "lio.yaml"))
    assert cfg.registration_config == "registration/scan_to_map.json"
    strategy, feat_cfg = cfg.build_scan_registration()
    assert isinstance(strategy, ScanToMapLoamRegistration)
    assert feat_cfg is not None
    filt = cfg.build_input_filters()
    assert len(filt) == 2
