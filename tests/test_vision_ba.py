"""Visual-inertial BA tests: reprojection factors + Schur-eliminated
landmarks — the VIO-milestone coverage (SURVEY.md §7.6, 'pseudo-marginalized
full BA'). Mirrors the reference's reprojection accuracy/convergence tests
(bs_constraints/tests/reprojection_test.cpp, euclidean_reprojection_test.cpp)
at the whole-window level."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beam_slam_tpu.core import factors as fc
from beam_slam_tpu.core import lie
from beam_slam_tpu.core.window import WindowState
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.utils import sim

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0
INTR = np.array([FX, FY, CX, CY], np.float32)


def project(q_wb, p_wb, q_bc, p_bc, X_w):
    q_wc = lie.quat_mul(q_wb, q_bc)
    p_wc = p_wb + lie.quat_rotate(q_wb, p_bc)
    X_c = lie.quat_rotate(lie.quat_conj(q_wc), X_w - p_wc)
    return jnp.stack([FX * X_c[0] / X_c[2] + CX,
                      FY * X_c[1] / X_c[2] + CY]), X_c[2]


def build_vio_problem(n_kf=6, n_lm=40, K=8, L=64, seed=0,
                      lm_perturb=0.2, pose_perturb=0.05,
                      pixel_noise=0.0, hold_poses=False):
    """Cameras looking forward (+z in camera = +x in body) at a landmark
    field ahead of a GT trajectory."""
    rng = np.random.default_rng(seed)
    traj = sim.AnalyticTrajectory(amp_p=(0.5, 0.5, 0.2), v_drift=(0.3, 0, 0))
    gt = traj.sample(jnp.arange(n_kf, dtype=jnp.float32) * 0.4)

    # camera extrinsic: camera z forward along body x, camera x → -y body,
    # camera y → -z body (columns of R_BC are the camera axes in body coords)
    q_bc = lie.matrix_to_quat(jnp.asarray(
        [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], jnp.float32))
    p_bc = jnp.asarray([0.1, 0.0, 0.05], jnp.float32)

    # landmarks ahead of the trajectory
    lms = np.stack([
        rng.uniform(4, 10, n_lm), rng.uniform(-4, 4, n_lm),
        rng.uniform(-2, 2, n_lm)], axis=1).astype(np.float32)

    window = WindowState.zeros(K, E=2, L=L)
    qs, ps = np.asarray(gt.q).copy(), np.asarray(gt.p).copy()
    if not hold_poses:
        # poses 0 and 1 are the (held) gauge — two fixed poses pin the
        # monocular scale as well; perturb only the free poses
        for i in range(2, n_kf):
            qs[i] = np.asarray(lie.quat_mul(jnp.asarray(qs[i]),
                                            lie.so3_exp_quat(jnp.asarray(
                rng.standard_normal(3).astype(np.float32) * pose_perturb))))
            ps[i] += rng.standard_normal(3).astype(np.float32) * pose_perturb
    window = window.replace(
        imu=window.imu.replace(
            q=window.imu.q.at[:n_kf].set(jnp.asarray(qs)),
            p=window.imu.p.at[:n_kf].set(jnp.asarray(ps)),
            v=window.imu.v.at[:n_kf].set(gt.v),
            active=window.imu.active.at[:n_kf].set(True),
            held=window.imu.held.at[:2].set(True) if not hold_poses
            else window.imu.held.at[:n_kf].set(True)),
        extrinsics=window.extrinsics.replace(
            q=window.extrinsics.q.at[1].set(q_bc),
            p=window.extrinsics.p.at[1].set(p_bc),
            active=window.extrinsics.active.at[1].set(True),
            held=window.extrinsics.held.at[1].set(True)),
        landmarks=window.landmarks.replace(
            pt=window.landmarks.pt.at[:n_lm].set(
                jnp.asarray(lms + rng.standard_normal((n_lm, 3))
                            .astype(np.float32) * lm_perturb)),
            active=window.landmarks.active.at[:n_lm].set(True)))

    # reprojection factors: every (kf, lm) pair that projects in front
    F = K * L
    rp = fc.ReprojectionFactors.zeros(F)
    f = 0
    slots, pix, act = [], [], []
    for i in range(n_kf):
        for l in range(n_lm):
            uv, z = project(gt.q[i], gt.p[i], q_bc, p_bc, jnp.asarray(lms[l]))
            if float(z) < 0.5:
                continue
            uv = np.asarray(uv)
            if not (0 <= uv[0] < 640 and 0 <= uv[1] < 480):
                continue
            if pixel_noise > 0:
                uv = uv + rng.standard_normal(2).astype(np.float32) * pixel_noise
            slots.append((i, 1, l))
            pix.append(uv)
            f += 1
    n_f = len(slots)
    rp = rp.replace(
        slots=rp.slots.at[:n_f].set(jnp.asarray(slots, jnp.int32)),
        active=rp.active.at[:n_f].set(True),
        pixel=rp.pixel.at[:n_f].set(jnp.asarray(np.asarray(pix))),
        intr=rp.intr.at[:, :].set(jnp.asarray(INTR)),
        sqrt_info=rp.sqrt_info.at[:n_f].set(jnp.eye(2)))
    return window, rp, gt, lms, n_kf, n_lm, n_f


def test_reprojection_residual_zero_at_gt():
    window, rp, gt, lms, n_kf, n_lm, n_f = build_vio_problem(
        lm_perturb=0.0, pose_perturb=0.0)
    r = rp.residual_only(window)
    assert np.abs(np.asarray(r)).max() < 1e-2


def _obs_counts(rp, n_lm):
    cnt = np.zeros(n_lm, int)
    slots = np.asarray(rp.slots[:, 2])
    act = np.asarray(rp.active)
    for s, a in zip(slots, act):
        if a and s < n_lm:
            cnt[s] += 1
    return cnt


def test_structure_only_ba_recovers_landmarks():
    """Poses held (structure-only BA): landmark perturbations must vanish for
    every landmark with ≥2 views (single-view depth is unobservable — those
    slots converge to zero residual but not to the GT point)."""
    window, rp, gt, lms, n_kf, n_lm, n_f = build_vio_problem(
        hold_poses=True, lm_perturb=0.3)
    before = np.linalg.norm(
        np.asarray(window.landmarks.pt[:n_lm]) - lms, axis=1)
    assert before.max() > 0.1
    out, diag = gn.solve(window, (rp,), (None,),
                         gn.SolverOptions(max_iterations=15))
    after = np.linalg.norm(np.asarray(out.landmarks.pt[:n_lm]) - lms, axis=1)
    assert float(diag.final_cost) < 1e-3 * float(diag.initial_cost)
    multi = _obs_counts(rp, n_lm) >= 2
    assert multi.sum() > 25
    assert after[multi].max() < 5e-3, after[multi].max()


def test_full_ba_recovers_poses_and_landmarks():
    """Windowed BA with first two poses held as gauge: both pose and
    landmark perturbations must vanish (multi-view constraints)."""
    window, rp, gt, lms, n_kf, n_lm, n_f = build_vio_problem(
        lm_perturb=0.15, pose_perturb=0.04)
    out, diag = gn.solve(window, (rp,), (None,),
                         gn.SolverOptions(max_iterations=25))
    assert float(diag.final_cost) < 1e-2 * float(diag.initial_cost)
    p_err = np.linalg.norm(
        np.asarray(out.imu.p[:n_kf]) - np.asarray(gt.p[:n_kf]), axis=1)
    assert p_err.max() < 2e-2, p_err
    lm_err = np.linalg.norm(np.asarray(out.landmarks.pt[:n_lm]) - lms, axis=1)
    multi = _obs_counts(rp, n_lm) >= 2
    assert lm_err[multi].max() < 5e-2, lm_err[multi].max()


def test_schur_matches_dense_elimination():
    """The Schur-reduced step must equal eliminating landmarks from the full
    (pose+landmark) normal equations — checked via a single GN step against a
    NumPy f64 dense solve."""
    window, rp, gt, lms, n_kf, n_lm, n_f = build_vio_problem(
        lm_perturb=0.05, pose_perturb=0.02)
    H, g, H_ll, g_l, W, _ = gn.assemble_normal_equations(
        window, (rp,), (None,))
    free = np.concatenate([np.asarray(window.dense_free_mask()), [False]])
    lm_free = np.asarray(window.landmarks.active & ~window.landmarks.held)

    lam = 1e-6
    delta, delta_l, ok = gn._solve_damped(
        jnp.asarray(H), jnp.asarray(g), jnp.asarray(free), lam,
        jnp.asarray(H_ll), jnp.asarray(g_l), jnp.asarray(W),
        jnp.asarray(lm_free))
    assert bool(ok)

    # f64 oracle: full dense system over [dense | landmarks], replicating the
    # solver's exact masking and damping (λ·diag in the Jacobi-scaled space
    # for the dense block; λ·diag + 1e-8 + trace floor for landmark blocks)
    D = H.shape[0]
    Lc = H_ll.shape[0]
    L3 = W.shape[1]
    Hf = np.zeros((D + L3, D + L3))
    Hd = np.asarray(H, np.float64) * np.outer(free, free)
    Hd[np.arange(D), np.arange(D)] += (~free).astype(float)
    Wf = (np.asarray(W, np.float64) * free[:, None]
          * np.repeat(lm_free, 3)[None, :])
    Hf[:D, :D] = Hd
    Hf[:D, D:] = Wf
    Hf[D:, :D] = Wf.T
    for l in range(Lc):
        blk = np.asarray(H_ll[l], np.float64)
        tr = np.trace(blk)
        blk = blk + np.diag(lam * np.diag(blk) + 1e-8) + 1e-5 * tr * np.eye(3)
        if not lm_free[l]:
            blk = np.eye(3)
        Hf[D + 3 * l: D + 3 * l + 3, D + 3 * l: D + 3 * l + 3] = blk
    gf = np.concatenate([np.asarray(g, np.float64) * free,
                         (np.asarray(g_l, np.float64)
                          * lm_free[:, None]).reshape(-1)])
    # dense λ damping in the solver acts on the Schur-REDUCED system after
    # Jacobi scaling: Hs += λI ⇔ H_red += λ·diag(H_red). Apply the same to
    # the oracle: diag(H_red) = diag(Hd − W·Hll⁻¹·Wᵀ).
    Hll_blk = Hf[D:, D:]
    Hll_inv = np.linalg.inv(Hll_blk)
    H_red_o = Hd - Wf @ Hll_inv @ Wf.T
    Hf[np.arange(D), np.arange(D)] += lam * np.maximum(np.diag(H_red_o), 0)
    # free dense dofs with zero information (velocities/biases untouched by
    # vision factors): the solver's scaled-space damping yields δ = 0 there;
    # pin them in the oracle so the comparison system is nonsingular.
    zero_info = free & (np.abs(np.diag(Hf)[:D]) < 1e-9)
    Hf[np.where(zero_info)[0], np.where(zero_info)[0]] = 1.0
    sol = np.linalg.solve(Hf, gf)
    np.testing.assert_allclose(np.asarray(delta), sol[:D], atol=5e-3)
    np.testing.assert_allclose(np.asarray(delta_l).reshape(-1), sol[D:],
                               atol=5e-3)
