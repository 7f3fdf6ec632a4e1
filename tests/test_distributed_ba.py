"""Sharded visual-inertial BA (parallel/distributed_ba.py): the full LVIO
factor set partitioned over the 8-device CPU mesh, psum-reduced normal
equations, replicated Schur solve — must agree with the single-device
solve (same math, different float reduction order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beam_slam_tpu.parallel import distributed_ba as dba
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.utils import synthetic


@pytest.fixture(scope="module")
def problem():
    build = jax.jit(lambda k: synthetic.build_lvio_window(
        k, n_kf=8, kf_dt=0.25, rate_hz=50.0, with_vision=True,
        n_landmarks=16, obs_per_lm=4, n_idp=4)[:2])
    window, families = jax.block_until_ready(build(jax.random.PRNGKey(7)))
    losses = (None, None, 1.0, 2.0, 2.0)
    return window, families, losses


def test_padding_is_inert(problem):
    window, families, losses = problem
    fams_p = tuple(dba.pad_family(f, 8) for f in families)
    a = gn.assemble_normal_equations(window, families, losses)
    b = gn.assemble_normal_equations(window, fams_p, losses)
    for name, x, y in zip(("H", "g", "H_ll", "g_l", "W", "cost"), a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6,
                                   err_msg=name)


def test_distributed_matches_single_device(problem):
    window, families, losses = problem
    mesh = dba.make_mesh(8)
    opts = gn.SolverOptions(max_iterations=6)
    out_s, diag_s = gn.solve(window, families, losses, opts)
    out_d, diag_d = dba.solve_distributed(mesh, window, families, losses,
                                          opts)
    # same accepted-step trajectory up to reduction-order float noise
    np.testing.assert_allclose(np.asarray(diag_d.final_cost),
                               np.asarray(diag_s.final_cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_d.imu.p),
                               np.asarray(out_s.imu.p), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_d.imu.q),
                               np.asarray(out_s.imu.q), atol=2e-3)
    act = np.asarray(window.landmarks.active)
    np.testing.assert_allclose(np.asarray(out_d.landmarks.pt)[act],
                               np.asarray(out_s.landmarks.pt)[act],
                               atol=5e-3)


def test_distributed_reduces_cost(problem):
    window, families, losses = problem
    mesh = dba.make_mesh(8)
    out, diag = dba.solve_distributed(mesh, window, families, losses,
                                      gn.SolverOptions(max_iterations=6))
    assert float(diag.final_cost) < 0.5 * float(diag.initial_cost)
    assert int(diag.iterations) >= 1
