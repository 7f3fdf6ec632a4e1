"""SfM-style trajectory bootstrapping from feature tracks.

Re-implements ``bs_models::vision::ComputePathWithVision``
(bs_models/src/lib/vision/utils.cpp:12-19 usage; SURVEY.md §2.4): build an
up-to-scale camera path from 2-view epipolar geometry + triangulation + PnP
chaining — the VISUAL mode of SLAMInitialization. Scale is resolved later by
the IMU alignment (estimate_scale=True).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.vision import geometry as geo
from beam_slam_tpu.vision.camera import PinholeRadtan


def decompose_essential(E: jnp.ndarray, xn1: jnp.ndarray, xn2: jnp.ndarray,
                        inliers: jnp.ndarray):
    """E → (R, t) with the cheirality test over the four candidates.
    Returns (q_21, t_21, n_good): pose of camera 1 expressed in camera 2
    (x2 ~ R·x1 + t), unit-norm translation."""
    U, S, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    Rs = [U @ W @ Vt, U @ W.T @ Vt]
    ts = [U[:, 2], -U[:, 2]]

    h1 = jnp.concatenate([xn1, jnp.ones((xn1.shape[0], 1), xn1.dtype)], 1)
    h2 = jnp.concatenate([xn2, jnp.ones((xn2.shape[0], 1), xn2.dtype)], 1)
    r1 = h1 / jnp.linalg.norm(h1, axis=1, keepdims=True)
    r2 = h2 / jnp.linalg.norm(h2, axis=1, keepdims=True)

    best = (None, None, -1)
    for R in Rs:
        for t in ts:
            # camera1 at origin; camera2 pose: X2 = R X1 + t
            # world = cam1 frame; cam2 world pose: R_wc2 = Rᵀ, p_wc2 = -Rᵀ t
            q_wc2 = lie.matrix_to_quat(R.T)
            p_wc2 = -(R.T @ t)
            X, ok = geo.triangulate_dlt(
                jnp.tile(lie.quat_identity(), (len(r1), 1)),
                jnp.zeros((len(r1), 3)),
                jnp.tile(q_wc2, (len(r1), 1)),
                jnp.tile(p_wc2, (len(r1), 1)), r1, r2)
            n_good = int(jnp.sum(ok & inliers))
            if n_good > best[2]:
                best = (R, t, n_good)
    return best


def compute_path_with_vision(
        camera: PinholeRadtan,
        tracks: Dict[int, List[Tuple[float, np.ndarray]]],
        stamps: List[float], min_parallax_px: float = 15.0,
        min_inliers: int = 30):
    """Up-to-scale baselink-agnostic *camera* path over ``stamps``.

    tracks: id → [(stamp, undistorted pixel)]. Returns
    [(stamp, q_wc, p_wc)] in the first camera's frame with unit baseline
    scale, or None if the geometry is degenerate (insufficient parallax /
    inliers).
    """
    if len(stamps) < 3:
        return None
    t0, t1 = stamps[0], stamps[-1]

    # correspondences first↔last
    ids, uv0s, uv1s = [], [], []
    for lm_id, obs in tracks.items():
        by_t = {t: uv for t, uv in obs}
        if t0 in by_t and t1 in by_t:
            ids.append(lm_id)
            uv0s.append(by_t[t0])
            uv1s.append(by_t[t1])
    if len(ids) < min_inliers:
        return None
    uv0s = np.stack(uv0s)
    uv1s = np.stack(uv1s)
    if np.median(np.linalg.norm(uv1s - uv0s, axis=1)) < min_parallax_px:
        return None

    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy
    xn0 = jnp.asarray((uv0s - [cx, cy]) / [fx, fy], jnp.float32)
    xn1 = jnp.asarray((uv1s - [cx, cy]) / [fx, fy], jnp.float32)
    res = geo.essential_ransac(xn0, xn1, jnp.ones(len(ids), bool), 256,
                               key=jax.random.PRNGKey(1))
    if int(res.n_inliers) < min_inliers:
        return None
    R, t, n_good = decompose_essential(res.E, xn0, xn1, res.inliers)
    if R is None or n_good < min_inliers:
        return None

    # triangulate the inlier landmarks in the first camera's frame
    q_wc1 = lie.matrix_to_quat(R.T)
    p_wc1 = -(R.T @ t)
    h0 = jnp.concatenate([xn0, jnp.ones((len(ids), 1), jnp.float32)], 1)
    h1 = jnp.concatenate([xn1, jnp.ones((len(ids), 1), jnp.float32)], 1)
    r0 = h0 / jnp.linalg.norm(h0, axis=1, keepdims=True)
    r1 = h1 / jnp.linalg.norm(h1, axis=1, keepdims=True)
    X, ok = geo.triangulate_dlt(
        jnp.tile(lie.quat_identity(), (len(ids), 1)),
        jnp.zeros((len(ids), 3)),
        jnp.tile(q_wc1, (len(ids), 1)), jnp.tile(p_wc1, (len(ids), 1)),
        r0, r1)
    ok = ok & res.inliers
    lm_world = {lm_id: np.asarray(X[i]) for i, lm_id in enumerate(ids)
                if bool(ok[i])}
    if len(lm_world) < min_inliers:
        return None

    # PnP-chain every stamp against the triangulated structure
    path = []
    q_prev, p_prev = lie.quat_identity(), jnp.zeros(3)
    for s in stamps:
        Xs, uvs = [], []
        for lm_id, Xw in lm_world.items():
            by_t = {t: uv for t, uv in tracks[lm_id]}
            if s in by_t:
                Xs.append(Xw)
                uvs.append(by_t[s])
        if len(Xs) < 10:
            return None
        pnp = geo.refine_pose(q_prev, p_prev, jnp.asarray(np.stack(Xs)),
                              jnp.asarray(np.stack(uvs)), camera.intr4,
                              jnp.ones(len(Xs), bool))
        if not bool(pnp.converged):
            return None
        q_prev, p_prev = pnp.q, pnp.p
        path.append((s, np.asarray(pnp.q), np.asarray(pnp.p)))
    return path
