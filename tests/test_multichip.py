"""Multi-chip sharding tests on the 8-virtual-device CPU mesh — coverage the
reference cannot have (single-host ROS); prescribed by SURVEY.md §7's test
strategy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beam_slam_tpu.parallel import sharded
from beam_slam_tpu.solver import gauss_newton as gn
from beam_slam_tpu.utils import synthetic


def test_synthetic_problem_solves():
    window, families, losses = synthetic.build_lvio_window(
        jax.random.PRNGKey(0), n_kf=8, kf_dt=0.25, rate_hz=100.0)
    out, diag = gn.solve(window, families, losses,
                         gn.SolverOptions(max_iterations=15))
    assert float(diag.final_cost) < float(diag.initial_cost) * 1e-2


def test_distributed_refinement_step_8_devices():
    assert jax.device_count() == 8
    mesh = sharded.make_mesh(8)
    windows, families, losses = synthetic.build_lvio_batch(
        jax.random.PRNGKey(1), batch=8, n_kf=4, kf_dt=0.25, rate_hz=50.0)
    out, diags, total = sharded.distributed_refinement_step(
        mesh, windows, families, losses, gn.SolverOptions(max_iterations=3))
    assert np.isfinite(float(total))
    # every submap's cost decreased
    assert np.all(np.asarray(diags.final_cost) <=
                  np.asarray(diags.initial_cost) + 1e-6)
    # outputs carry the submap sharding (solve ran partitioned)
    shard_devs = {s.device.id for s in out.imu.p.addressable_shards}
    assert len(shard_devs) == 8


def test_batched_equals_single():
    """Sharded batched solve must agree with per-problem solves."""
    windows, families, losses = synthetic.build_lvio_batch(
        jax.random.PRNGKey(2), batch=2, n_kf=4, kf_dt=0.25, rate_hz=50.0)
    opts = gn.SolverOptions(max_iterations=4)
    out_b, diag_b = sharded.solve_batched(windows, families, losses, opts)
    for b in range(2):
        w1 = jax.tree_util.tree_map(lambda x: x[b], windows)
        f1 = jax.tree_util.tree_map(lambda x: x[b], families)
        out1, diag1 = gn.solve(w1, f1, losses, opts)
        np.testing.assert_allclose(np.asarray(out1.imu.p),
                                   np.asarray(out_b.imu.p[b]), atol=1e-5)
        assert float(diag1.final_cost) == pytest.approx(
            float(diag_b.final_cost[b]), rel=1e-4)


def test_graft_entry_contract():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
