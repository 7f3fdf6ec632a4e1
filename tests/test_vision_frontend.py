"""Vision front-end kernel tests: FAST detection, pyramidal LK tracking,
triangulation, essential RANSAC, PnP refinement — synthetic-scene ground
truth in the style of the reference's CV-utility usage (SURVEY.md §4)."""

import numpy as np
import pytest
from scipy import ndimage

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.vision import camera as cam
from beam_slam_tpu.vision import detector as det
from beam_slam_tpu.vision import geometry as geo
from beam_slam_tpu.vision import tracker as trk


def _textured_image(rng, H=240, W=320, n_blobs=150):
    img = np.zeros((H, W), np.float32)
    ys = rng.uniform(10, H - 10, n_blobs)
    xs = rng.uniform(10, W - 10, n_blobs)
    amps = rng.uniform(60, 200, n_blobs)
    yy, xx = np.mgrid[0:H, 0:W]
    for y, x, a in zip(ys, xs, amps):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 2.5 ** 2))
    return np.clip(img, 0, 255).astype(np.float32)


def test_fast_detects_square_corners(rng):
    img = np.zeros((128, 128), np.float32)
    img[40:80, 40:80] = 200.0
    xy, score, valid = det.detect(jnp.asarray(img),
                                  det.FastConfig(cell_size=16))
    pts = np.asarray(xy)[np.asarray(valid)]
    assert len(pts) >= 4
    corners = np.array([[40, 40], [40, 79], [79, 40], [79, 79]], np.float32)
    for c in corners:
        d = np.linalg.norm(pts - c[None, :], axis=1).min()
        assert d < 6.0, (c, d)


def test_lk_tracks_known_shift(rng):
    img1 = _textured_image(rng)
    shift = (2.7, -3.4)  # (dy, dx)
    img2 = ndimage.shift(img1, shift, order=1, mode="nearest")
    xy, score, valid = det.detect(jnp.asarray(img1),
                                  det.FastConfig(threshold=10.0,
                                                 cell_size=32))
    pyr1 = tuple(trk.build_pyramid(jnp.asarray(img1), 3))
    pyr2 = tuple(trk.build_pyramid(jnp.asarray(img2), 3))
    new_xy, ok = trk.track(pyr1, pyr2, xy, valid)
    ok = np.asarray(ok)
    assert ok.sum() >= 10
    d = np.asarray(new_xy)[ok] - np.asarray(xy)[ok]
    med = np.median(d, axis=0)
    # image shifted by (dy,dx) ⇒ features move by (+dx, +dy)
    np.testing.assert_allclose(med, [shift[1], shift[0]], atol=0.25)


def test_triangulation_recovers_points(rng):
    n = 50
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], axis=1).astype(np.float32)
    q1 = lie.quat_identity()
    p1 = jnp.zeros(3)
    q2 = lie.so3_exp_quat(jnp.asarray([0.02, -0.05, 0.01], jnp.float32))
    p2 = jnp.asarray([0.8, 0.1, 0.0], jnp.float32)
    r1 = jnp.asarray(X) / jnp.linalg.norm(jnp.asarray(X), axis=1,
                                          keepdims=True)
    X_c2 = lie.quat_rotate(lie.quat_conj(q2)[None], jnp.asarray(X) - p2)
    r2 = X_c2 / jnp.linalg.norm(X_c2, axis=1, keepdims=True)
    Xr, valid = geo.triangulate_dlt(
        jnp.tile(q1, (n, 1)), jnp.tile(p1, (n, 1)),
        jnp.tile(q2, (n, 1)), jnp.tile(p2, (n, 1)), r1, r2)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(Xr), X, atol=5e-2)


def test_essential_ransac_separates_outliers(rng):
    n = 120
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], axis=1).astype(np.float32)
    q2 = lie.so3_exp_quat(jnp.asarray([0.03, -0.02, 0.05], jnp.float32))
    p2 = jnp.asarray([0.5, -0.2, 0.1], jnp.float32)
    xn1 = X[:, :2] / X[:, 2:3]
    X_c2 = np.asarray(lie.quat_rotate(lie.quat_conj(q2)[None],
                                      jnp.asarray(X) - p2))
    xn2 = X_c2[:, :2] / X_c2[:, 2:3]
    is_outlier = np.zeros(n, bool)
    out_idx = rng.choice(n, 25, replace=False)
    is_outlier[out_idx] = True
    xn2[is_outlier] += rng.uniform(0.05, 0.2, (25, 2)) * \
        rng.choice([-1, 1], (25, 2))
    res = geo.essential_ransac(jnp.asarray(xn1), jnp.asarray(xn2),
                               jnp.ones(n, bool), 256,
                               key=jax.random.PRNGKey(3))
    inl = np.asarray(res.inliers)
    # every outlier rejected, vast majority of inliers kept
    assert not inl[is_outlier].any()
    assert inl[~is_outlier].mean() > 0.9


def test_refine_pose_recovers_perturbation(rng):
    n = 60
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], axis=1).astype(np.float32)
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0])
    q_true = lie.so3_exp_quat(jnp.asarray([0.05, -0.1, 0.08], jnp.float32))
    p_true = jnp.asarray([0.3, -0.2, 0.4], jnp.float32)
    X_c = lie.quat_rotate(lie.quat_conj(q_true)[None], jnp.asarray(X) - p_true)
    uv = jnp.stack([400.0 * X_c[:, 0] / X_c[:, 2] + 320.0,
                    400.0 * X_c[:, 1] / X_c[:, 2] + 240.0], axis=-1)
    q0 = lie.quat_mul(q_true, lie.so3_exp_quat(
        jnp.asarray([0.03, 0.02, -0.05], jnp.float32)))
    p0 = p_true + jnp.asarray([0.15, -0.1, 0.1], jnp.float32)
    res = geo.refine_pose(q0, p0, jnp.asarray(X), uv, intr,
                          jnp.ones(n, bool))
    assert bool(res.converged)
    assert float(jnp.linalg.norm(res.p - p_true)) < 1e-3
    assert float(res.mean_error_px) < 0.1
    dth = lie.so3_log(lie.quat_mul(lie.quat_conj(res.q), q_true))
    assert float(jnp.linalg.norm(dth)) < 1e-3


def test_refine_pose_robust_to_outliers(rng):
    n = 60
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], axis=1).astype(np.float32)
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0])
    q_true = lie.quat_identity()
    p_true = jnp.zeros(3)
    uv = np.stack([400.0 * X[:, 0] / X[:, 2] + 320.0,
                   400.0 * X[:, 1] / X[:, 2] + 240.0], axis=-1)
    uv[:10] += rng.uniform(40, 120, (10, 2))  # gross outliers
    q0 = lie.so3_exp_quat(jnp.asarray([0.02, -0.02, 0.01], jnp.float32))
    p0 = jnp.asarray([0.1, 0.05, -0.08], jnp.float32)
    res = geo.refine_pose(q0, p0, jnp.asarray(X), jnp.asarray(uv), intr,
                          jnp.ones(n, bool))
    assert float(jnp.linalg.norm(res.p - p_true)) < 2e-2
    assert int(res.n_inliers) >= 45


def test_camera_model_roundtrip(rng):
    c = cam.PinholeRadtan(400.0, 405.0, 320.0, 240.0, k1=-0.1, k2=0.02,
                          p1=1e-3, p2=-5e-4)
    X = jnp.asarray(np.stack([rng.uniform(-2, 2, 30), rng.uniform(-1.5, 1.5, 30),
                              rng.uniform(2, 8, 30)], axis=1), jnp.float32)
    uv, valid = c.project(X)
    uv_u = c.undistort_pixel(uv)
    # undistorted pixel must match the ideal pinhole projection
    ideal = jnp.stack([400.0 * X[:, 0] / X[:, 2] + 320.0,
                       405.0 * X[:, 1] / X[:, 2] + 240.0], axis=-1)
    sel = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(uv_u)[sel], np.asarray(ideal)[sel],
                               atol=0.1)
    # back_project returns the bearing of the point
    rays = c.back_project(uv_u)
    ray_gt = X / jnp.linalg.norm(X, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rays)[sel],
                               np.asarray(ray_gt)[sel], atol=1e-3)
