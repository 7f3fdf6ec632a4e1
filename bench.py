#!/usr/bin/env python
"""Flagship benchmark: LVIO sliding-window bundle-adjustment solve time.

Baseline: the reference runs its LVIO fixed-lag smoother with a max Ceres
solver budget of 0.05 s per cycle on an 8-thread CPU
(beam_slam_launch/config/lvio.yaml:13-14 max_solver_time_in_seconds: 0.05;
see BASELINE.md). We measure the full LM solve (10 iterations) of an
LVIO-shaped window — 40 IMU states over a 10 s lag, preintegrated IMU chain +
lidar relative-pose factors with extrinsic + window-start prior — on one TPU
chip, steady-state (compiled).

Prints one JSON line:
  {"metric": "lvio_window_solve_ms", "value": ..., "unit": "ms",
   "vs_baseline": <50ms / value>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from beam_slam_tpu.solver import gauss_newton as gn
    from beam_slam_tpu.utils import synthetic

    # LVIO envelope: 10 s lag, ~4 Hz keyframes → 40 states (BASELINE.md).
    # The whole problem build is jitted: eager per-op dispatch is pathologically
    # slow through remote-TPU tunnels, and the build is pure jnp anyway.
    key = jax.random.PRNGKey(0)
    losses = (None, None, 1.0)
    build = jax.jit(
        lambda k: synthetic.build_lvio_window(k, n_kf=40, kf_dt=0.25)[:2])
    window, families = jax.block_until_ready(build(key))
    options = gn.SolverOptions(max_iterations=10, scan_length=10)

    # Steady-state measurement: chain R full solves inside ONE jitted call
    # (each consumes the previous output window, like successive smoother
    # ticks) so the per-call host→device dispatch overhead — ~30 ms through
    # the remote-TPU tunnel, absent in production co-located serving — is
    # amortized out of the per-cycle figure.
    R = 16

    @jax.jit
    def chained(win):
        def body(w, _):
            out, diag = gn.solve(w, families, losses, options)
            return out, diag.final_cost
        return jax.lax.scan(body, win, None, length=R)

    out, costs = chained(window)
    jax.block_until_ready(out)  # compile + warm up

    n_rep = 8
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out, costs = chained(window)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    median_ms = 1e3 * times[len(times) // 2] / R

    baseline_ms = 50.0  # reference per-cycle solver budget (lvio.yaml:14)
    print(json.dumps({
        "metric": "lvio_window_solve_ms",
        "value": round(median_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / median_ms, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
