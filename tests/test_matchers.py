"""ICP/GICP matcher tests (the perturbed-cloud recovery pattern)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar import matchers
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene


@pytest.fixture(scope="module")
def cloud():
    grid = synthetic_structured_scene(n_rings=16, width=504)
    pts = np.asarray(grid.xyz).reshape(-1, 3)
    valid = np.asarray(grid.valid).reshape(-1)
    # subsample for speed
    pts, valid = pts[::4], valid[::4]
    return jnp.asarray(pts), jnp.asarray(valid)


Q_TRUE = lie.so3_exp_quat(jnp.asarray([0.03, -0.02, 0.06], jnp.float32))
P_TRUE = jnp.asarray([0.25, -0.15, 0.1], jnp.float32)


def _src_from(cloud_pts, cloud_valid):
    """Source cloud = target observed from the (true) transformed frame:
    registering source onto target must recover (Q_TRUE, P_TRUE)."""
    src = lie.quat_rotate(lie.quat_conj(Q_TRUE)[None], cloud_pts - P_TRUE)
    return src, cloud_valid


@pytest.mark.parametrize("fn,tol_xy,tol_z", [
    # point-to-point ICP is z-ambiguous on ring-structured clouds (sparse
    # horizontal stripes on vertical walls) — wider vertical tolerance
    (matchers.icp_point_to_point, 0.03, 0.15),
    (matchers.gicp_point_to_plane, 0.03, 0.03),
    # NDT voxel Gaussians are coarse (1 m cells) — decimeter accuracy
    (matchers.ndt_voxel_gaussian, 0.15, 0.15),
])
def test_matcher_recovers_pose(cloud, fn, tol_xy, tol_z):
    tgt, tgt_valid = cloud
    src, src_valid = _src_from(tgt, tgt_valid)
    q0 = lie.quat_mul(Q_TRUE, lie.so3_exp_quat(
        jnp.asarray([0.02, 0.015, -0.03], jnp.float32)))
    p0 = P_TRUE + jnp.asarray([-0.08, 0.06, 0.04], jnp.float32)
    res = fn(src, src_valid, tgt, tgt_valid, q0, p0,
             matchers.MatcherConfig(iterations=15))
    assert bool(res.converged)
    err = np.abs(np.asarray(res.p - P_TRUE))
    assert np.linalg.norm(err[:2]) < tol_xy, err
    assert err[2] < tol_z, err
    dth = lie.so3_log(lie.quat_mul(lie.quat_conj(res.q), Q_TRUE))
    assert float(jnp.linalg.norm(dth)) < 0.02


def test_matcher_reports_failure_on_garbage(cloud):
    tgt, tgt_valid = cloud
    src = jnp.asarray(np.random.default_rng(0).uniform(
        100, 200, (500, 3)).astype(np.float32))
    res = matchers.icp_point_to_point(
        src, jnp.ones(500, bool), tgt, tgt_valid,
        lie.quat_identity(), jnp.zeros(3),
        matchers.MatcherConfig(iterations=5))
    assert not bool(res.converged)
    assert int(res.n_inliers) < 30
