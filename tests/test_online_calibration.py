"""Online extrinsic calibration: with the extrinsic slot un-held
(bs_variables Position3D/Orientation3D + the online-calib reprojection
functor role), windowed BA must refine a miscalibrated camera extrinsic."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.solver import gauss_newton as gn
from test_vision_ba import build_vio_problem


def test_online_camera_extrinsic_calibration():
    window, rp, gt, lms, n_kf, n_lm, n_f = build_vio_problem(
        lm_perturb=0.0, pose_perturb=0.0, hold_poses=True)
    # true extrinsic is in slot 1; perturb it and un-hold it
    q_true = window.extrinsics.q[1]
    p_true = window.extrinsics.p[1]
    dq = lie.so3_exp_quat(jnp.asarray([0.02, -0.015, 0.01], jnp.float32))
    window = window.replace(extrinsics=window.extrinsics.replace(
        q=window.extrinsics.q.at[1].set(lie.quat_mul(q_true, dq)),
        p=window.extrinsics.p.at[1].set(
            p_true + jnp.asarray([0.03, -0.02, 0.04])),
        held=window.extrinsics.held.at[1].set(False)))
    # landmarks held at truth so the calibration is observable
    window = window.replace(landmarks=window.landmarks.replace(
        held=window.landmarks.held.at[:n_lm].set(True)))

    out, diag = gn.solve(window, (rp,), (None,),
                         gn.SolverOptions(max_iterations=20))
    assert float(diag.final_cost) < 1e-3 * float(diag.initial_cost)
    dth = lie.so3_log(lie.quat_mul(lie.quat_conj(out.extrinsics.q[1]),
                                   q_true))
    assert float(jnp.linalg.norm(dth)) < 2e-3
    assert float(jnp.linalg.norm(out.extrinsics.p[1] - p_true)) < 5e-3
