"""Batched Levenberg–Marquardt over the fixed-shape window state.

This is the TPU-native replacement for the Ceres solve inside
``fuse_graphs::HashGraph::optimize`` (driven by the reference fixed-lag
smoother, bs_optimizers/src/fixed_lag_smoother.cpp:281 with
SPARSE_NORMAL_CHOLESKY, ≤10-40 iterations, ≤0.05 s — lvio.yaml:7-17).

Design (SURVEY.md §7.2):
  * Every factor family linearizes in one ``vmap`` (residual + Jacobian via
    forward-mode autodiff), producing whitened blocks.
  * The normal equations are assembled densely over the window's tangent dof
    (K·15 IMU dof + E·6 extrinsic dof — a 10 s window is O(10²-10³) dof, far
    below MXU saturation) with scatter-adds; landmark blocks are handled by
    Schur elimination (see :mod:`beam_slam_tpu.solver.schur`).
  * The damped system is solved by dense Cholesky after Jacobi equilibration —
    the float32 conditioning strategy (column scaling makes the reduced system
    ~unit-diagonal so f32 Cholesky is accurate; validated against f64 oracles
    in tests).
  * The LM loop is a ``lax.scan`` of a fixed number of iterations with
    in-graph accept/reject ("delayed gratification" damping) and an inert
    ``done`` latch for early convergence — compiler-friendly control flow, no
    recompiles, no host sync inside the loop.

``holdVariable`` (fuse) and inactive slots are handled by masking rows/columns
of H and pinning those dof to zero update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beam_slam_tpu.core.window import WindowState

_DIAG_EPS = 1e-12


class SolverOptions(NamedTuple):
    """Static solve configuration (hashable → usable as a jit static arg).

    Mirrors the solver_options block of the reference configs
    (beam_slam_launch/config/lvio.yaml:7-17).
    """

    max_iterations: int = 10
    function_tolerance: float = 1e-6
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-12
    max_lambda: float = 1e8


class SolveDiagnostics(NamedTuple):
    """Per-solve diagnostics mirroring the Ceres summary fields surfaced by
    the reference (fixed_lag_smoother.cpp:705-718: termination type, total
    time, iterations, initial/final cost)."""

    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray   # accepted LM steps
    converged: jnp.ndarray    # hit function_tolerance before max_iterations
    final_lambda: jnp.ndarray


def robust_weight(sq_norm: jnp.ndarray, loss_scale: Optional[float]):
    """IRLS weight + cost for a (optionally Cauchy-robustified) factor.

    The reference attaches ``fuse_loss::CauchyLoss`` to lidar/visual pose
    factors (bs_constraints/relative_pose/pose_3d_stamped_transaction.cpp).
    Cauchy: ρ(s) = c²·log(1 + s/c²); weight ρ'(s) = 1/(1 + s/c²).
    """
    if loss_scale is None:
        return jnp.ones_like(sq_norm), sq_norm
    c2 = loss_scale * loss_scale
    w = 1.0 / (1.0 + sq_norm / c2)
    rho = c2 * jnp.log1p(sq_norm / c2)
    return w, rho


def assemble_normal_equations(
    window: WindowState,
    families: Sequence,
    losses: Tuple[Optional[float], ...],
):
    """Linearize every factor family and scatter-add into dense (H, g).

    Returns H [D+1, D+1], g [D+1] (last row/col is the landmark trash dof)
    and the total robustified cost 0.5·Σρ.
    """
    D = window.num_dense_dof
    dtype = window.imu.q.dtype
    H = jnp.zeros((D + 1, D + 1), dtype)
    g = jnp.zeros((D + 1,), dtype)
    cost = jnp.zeros((), dtype)

    for fam, loss in zip(families, losses):
        r, J, col, _ = fam.linearize(window)
        s = jnp.sum(r * r, axis=-1)
        w, rho = robust_weight(s, loss)
        cost = cost + 0.5 * jnp.sum(rho)
        sw = jnp.sqrt(w)
        r = r * sw[:, None]
        J = J * sw[:, None, None]
        # g -= Jᵀ r  (scatter over local columns)
        g = g.at[col].add(-jnp.einsum("fri,fr->fi", J, r))
        # H += Jᵀ J  (scatter [Dl, Dl] blocks)
        H = H.at[col[:, :, None], col[:, None, :]].add(
            jnp.einsum("fri,frj->fij", J, J)
        )
    return H, g, cost


def total_cost(window: WindowState, families: Sequence,
               losses: Tuple[Optional[float], ...]) -> jnp.ndarray:
    """Robustified cost only (no Jacobians) — used for LM trial evaluation."""
    cost = jnp.zeros((), window.imu.q.dtype)
    for fam, loss in zip(families, losses):
        r = fam.residual_only(window)
        s = jnp.sum(r * r, axis=-1)
        _, rho = robust_weight(s, loss)
        cost = cost + 0.5 * jnp.sum(rho)
    return cost


def _solve_damped(H, g, free, lam):
    """Solve (H + λ·diag(H))δ = g on the free dof with Jacobi equilibration.

    Equilibration: with s = 1/√diag(H), solve (S H S + λI) y = S g, δ = S y —
    the f32-conditioning workhorse (SURVEY.md §7 "Double precision" risk).
    """
    dtype = H.dtype
    freef = free.astype(dtype)
    # Mask held/inactive dof: identity rows so they stay put.
    Hm = H * (freef[:, None] * freef[None, :])
    Hm = Hm + jnp.diag(1.0 - freef)
    gm = g * freef

    d = jnp.diagonal(Hm)
    s = jax.lax.rsqrt(jnp.maximum(d, _DIAG_EPS))
    Hs = Hm * (s[:, None] * s[None, :])
    Hs = Hs + lam * jnp.eye(Hs.shape[0], dtype=dtype)
    gs = gm * s
    L = jnp.linalg.cholesky(Hs)
    y = jax.scipy.linalg.cho_solve((L, True), gs)
    delta = y * s * freef
    ok = jnp.all(jnp.isfinite(delta))
    return jnp.where(ok, delta, jnp.zeros_like(delta)), ok


@functools.partial(jax.jit, static_argnums=(2, 3))
def solve(
    window: WindowState,
    families: Tuple,
    losses: Tuple[Optional[float], ...],
    options: SolverOptions = SolverOptions(),
) -> Tuple[WindowState, SolveDiagnostics]:
    """Run LM on the window. ``families``/``losses`` are parallel tuples;
    family *types* and capacities are static, their array contents traced."""
    dtype = window.imu.q.dtype
    free_full = window.dense_free_mask()
    free = jnp.concatenate([free_full, jnp.zeros((1,), bool)])  # trash dof

    init_cost = total_cost(window, families, losses)

    def step(carry, _):
        win, lam, cost, done, iters = carry
        H, g, _ = assemble_normal_equations(win, families, losses)
        delta, ok = _solve_damped(H, g, free, lam)
        trial = win.retract_dense(delta[:-1])
        new_cost = total_cost(trial, families, losses)
        accept = ok & (new_cost < cost) & ~done
        win = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), win, trial
        )
        rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = done | (accept & (rel_drop < options.function_tolerance))
        lam = jnp.where(
            done, lam,
            jnp.where(accept, jnp.maximum(lam * 0.5, options.min_lambda),
                      jnp.minimum(lam * 4.0, options.max_lambda)),
        )
        cost = jnp.where(accept, new_cost, cost)
        iters = iters + accept.astype(jnp.int32)
        return (win, lam, cost, done, iters), None

    lam0 = jnp.asarray(options.initial_lambda, dtype)
    carry0 = (window, lam0, init_cost, jnp.zeros((), bool), jnp.zeros((), jnp.int32))
    (window, lam, cost, done, iters), _ = jax.lax.scan(
        step, carry0, None, length=options.max_iterations
    )
    diag = SolveDiagnostics(
        initial_cost=init_cost, final_cost=cost, iterations=iters,
        converged=done, final_lambda=lam,
    )
    return window, diag
