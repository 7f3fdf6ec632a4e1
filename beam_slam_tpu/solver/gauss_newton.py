"""Batched Levenberg–Marquardt over the fixed-shape window state, with
Schur-complement elimination of landmarks.

This is the TPU-native replacement for the Ceres solve inside
``fuse_graphs::HashGraph::optimize`` (driven by the reference fixed-lag
smoother, bs_optimizers/src/fixed_lag_smoother.cpp:281 with
SPARSE_NORMAL_CHOLESKY, ≤10-40 iterations, ≤0.05 s — lvio.yaml:7-17).

Design (SURVEY.md §7.2):
  * Every factor family linearizes in one ``vmap`` (residual + Jacobian via
    forward-mode autodiff), producing whitened blocks.
  * The normal equations are assembled densely over the window's tangent dof
    (K·15 IMU dof + E·6 extrinsic dof) with scatter-adds. Landmark blocks
    (visual BA) are **Schur-eliminated on chip**: per-landmark 3×3 diagonal
    blocks H_ll, the pose-landmark coupling W, and the reduced camera system
    H_red = H_pp − W·H_ll⁻¹·Wᵀ — one MXU matmul — then dense Cholesky on the
    reduced system and closed-form landmark back-substitution.
  * Jacobi equilibration makes the reduced system ~unit-diagonal so float32
    Cholesky is accurate (validated against f64 oracles in tests).
  * The LM loop is a ``lax.scan`` of a fixed number of iterations with
    in-graph accept/reject ("delayed gratification" damping) and an inert
    ``done`` latch — compiler-friendly control flow, no recompiles, no host
    sync inside the loop.

``holdVariable`` (fuse) and inactive slots are handled by masking rows/columns
of H (and W / H_ll for landmarks) and pinning those dof to zero update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from beam_slam_tpu.core.window import LANDMARK_DOF, WindowState

_DIAG_EPS = 1e-12


class SolverOptions(NamedTuple):
    """Solve configuration. Mirrors the solver_options block of the
    reference configs (beam_slam_launch/config/lvio.yaml:7-17).

    ``max_iterations`` is a *runtime* limit (traced — changing it does NOT
    recompile); the compiled LM scan always has ``scan_length`` steps, with
    iterations beyond the limit inert. Keep ``scan_length`` at its default
    so every solve of a given window shape shares one executable — each
    distinct static configuration costs a full XLA compile.
    """

    max_iterations: int = 10
    function_tolerance: float = 1e-6
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-12
    max_lambda: float = 1e8
    scan_length: int = 32  # static compiled iteration capacity


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
    """Linearize every factor family and scatter-add the normal equations.

    Returns (H [D+1,D+1], g [D+1], H_ll [L,3,3], g_l [L,3], W [D+1,L·3],
    cost). The last dense row/col is a padding ("trash") dof.
    """
    D = window.num_dense_dof
    L = window.landmarks.capacity
    dtype = window.imu.q.dtype
    H = jnp.zeros((D + 1, D + 1), dtype)
    g = jnp.zeros((D + 1,), dtype)
    H_ll = jnp.zeros((L, 3, 3), dtype)
    g_l = jnp.zeros((L, 3), dtype)
    W = jnp.zeros((D + 1, L * LANDMARK_DOF), dtype)
    cost = jnp.zeros((), dtype)

    for fam, loss in zip(families, losses):
        r, J, col, _, lm_slot, J_lm = fam.linearize(window)
        s = jnp.sum(r * r, axis=-1)
        w, rho = robust_weight(s, loss)
        cost = cost + 0.5 * jnp.sum(rho)
        sw = jnp.sqrt(w)
        r = r * sw[:, None]
        J = J * sw[:, None, None]
        # g -= Jᵀ r  (scatter over local columns)
        g = g.at[col].add(-jnp.einsum("fri,fr->fi", J, r))
        # H += Jᵀ J  (scatter [Dd, Dd] blocks)
        H = H.at[col[:, :, None], col[:, None, :]].add(
            jnp.einsum("fri,frj->fij", J, J)
        )
        if lm_slot is not None:
            J_lm = J_lm * sw[:, None, None]
            H_ll = H_ll.at[lm_slot].add(jnp.einsum("fri,frj->fij", J_lm, J_lm))
            g_l = g_l.at[lm_slot].add(-jnp.einsum("fri,fr->fi", J_lm, r))
            lm_cols = (lm_slot[:, None] * LANDMARK_DOF
                       + jnp.arange(LANDMARK_DOF, dtype=jnp.int32)[None, :])
            W = W.at[col[:, :, None], lm_cols[:, None, :]].add(
                jnp.einsum("fri,frj->fij", J, J_lm)
            )
    return H, g, H_ll, g_l, W, cost


# jitted assembly entry point for host callers (e.g. exact marginalization) —
# eager per-op dispatch is pathologically slow on remote-TPU backends
assemble_normal_equations_jit = functools.partial(
    jax.jit, static_argnums=(2,))(assemble_normal_equations)


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


def _solve_damped(H, g, free, lam, H_ll, g_l, W, lm_free):
    """Schur-reduced damped solve.

    Dense part: (S·H_red·S + λI) y = S·g_red with Jacobi scaling S — the
    float32-conditioning workhorse (SURVEY.md §7 'Double precision' risk).
    Landmarks: per-slot 3×3 inverses of (H_ll + λ·diag(H_ll)), masked by
    ``lm_free``; back-substituted after the reduced solve.
    """
    dtype = H.dtype
    Dp = H.shape[0]
    L = H_ll.shape[0]
    freef = free.astype(dtype)
    lmf = lm_free.astype(dtype)

    # mask held/inactive dense dof and landmark slots
    Hm = H * (freef[:, None] * freef[None, :])
    Hm = Hm + jnp.diag(1.0 - freef)
    gm = g * freef
    W = W * freef[:, None] * jnp.repeat(lmf, LANDMARK_DOF)[None, :]
    eye3 = jnp.eye(3, dtype=dtype)
    # damping λ·diag(H_ll) + a trace-relative floor: a landmark seen from a
    # single view has a rank-2 3×3 block whose f32 inverse explodes and makes
    # the Schur complement indefinite; the floor bounds ‖H_ll⁻¹‖ by ~1e5/tr.
    diag_ll = jax.vmap(jnp.diag)(H_ll)
    tr = jnp.trace(H_ll, axis1=1, axis2=2)
    Hll_d = (H_ll + jax.vmap(jnp.diag)(lam * diag_ll + 1e-8)
             + (1e-5 * tr)[:, None, None] * eye3[None])
    Hll_d = jnp.where(lmf[:, None, None] > 0, Hll_d, eye3[None])
    g_l = g_l * lmf[:, None]
    Hll_inv = jnp.linalg.inv(Hll_d)

    # reduced camera system: H_red = H - W·Hll⁻¹·Wᵀ (MXU work)
    Wr = W.reshape(Dp, L, 3)
    Y = jnp.einsum("dlk,lkm->dlm", Wr, Hll_inv)
    H_red = Hm - jnp.einsum("dlm,elm->de", Y, Wr)
    g_red = gm - jnp.einsum("dlm,lm->d", Y, g_l)

    d = jnp.diagonal(H_red)
    s = jax.lax.rsqrt(jnp.maximum(d, _DIAG_EPS))
    Hs = H_red * (s[:, None] * s[None, :])
    Hs = Hs + lam * jnp.eye(Dp, dtype=dtype)
    gs = g_red * s
    Lc = jnp.linalg.cholesky(Hs)
    y = jax.scipy.linalg.cho_solve((Lc, True), gs)
    delta = y * s * freef

    # landmark back-substitution: δ_l = Hll⁻¹ (g_l − Wᵀ δ_p)
    rhs_l = g_l - jnp.einsum("dlk,d->lk", Wr, delta)
    delta_l = jnp.einsum("lkm,lk->lm", Hll_inv, rhs_l) * lmf[:, None]

    ok = jnp.all(jnp.isfinite(delta)) & jnp.all(jnp.isfinite(delta_l))
    delta = jnp.where(ok, delta, jnp.zeros_like(delta))
    delta_l = jnp.where(ok, delta_l, jnp.zeros_like(delta_l))
    return delta, delta_l, ok


def solve(
    window: WindowState,
    families: Tuple,
    losses: Tuple[Optional[float], ...],
    options: SolverOptions = SolverOptions(),
) -> Tuple[WindowState, SolveDiagnostics]:
    """Run LM on the window. ``families``/``losses`` are parallel tuples;
    family *types* and capacities are static, their array contents traced.
    ``options.max_iterations`` is passed as a traced scalar so different
    iteration budgets share one compiled executable."""
    n_iter = jnp.asarray(
        min(options.max_iterations, options.scan_length), jnp.int32)
    static = options._replace(max_iterations=0)
    return _solve_impl(window, families, n_iter, losses, static)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _solve_impl(window, families, n_iter, losses,
                options: SolverOptions):
    free_full = window.dense_free_mask()
    free = jnp.concatenate([free_full, jnp.zeros((1,), bool)])  # trash dof
    lm_free = window.landmarks.active & ~window.landmarks.held

    init_cost = total_cost(window, families, losses)

    def step(carry, _):
        win, lam, cost, done, iters, attempt = carry
        active = ~done & (attempt < n_iter)
        H, g, H_ll, g_l, W, _ = assemble_normal_equations(win, families,
                                                          losses)
        delta, delta_l, ok = _solve_damped(H, g, free, lam, H_ll, g_l, W,
                                           lm_free)
        trial = win.retract_dense(delta[:-1])
        trial = trial.replace(landmarks=trial.landmarks.retract(delta_l))
        new_cost = total_cost(trial, families, losses)
        accept = ok & (new_cost < cost) & active
        win = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), win, trial
        )
        rel_drop = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done = done | (accept & (rel_drop < options.function_tolerance))
        lam = jnp.where(
            ~active | done, lam,
            jnp.where(accept, jnp.maximum(lam * 0.5, options.min_lambda),
                      jnp.minimum(lam * 4.0, options.max_lambda)),
        )
        cost = jnp.where(accept, new_cost, cost)
        iters = iters + accept.astype(jnp.int32)
        return (win, lam, cost, done, iters, attempt + 1), None

    dtype = window.imu.q.dtype
    lam0 = jnp.asarray(options.initial_lambda, dtype)
    carry0 = (window, lam0, init_cost, jnp.zeros((), bool),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (window, lam, cost, done, iters, _), _ = jax.lax.scan(
        step, carry0, None, length=options.scan_length
    )
    diag = SolveDiagnostics(
        initial_cost=init_cost, final_cost=cost, iterations=iters,
        converged=done, final_lambda=lam,
    )
    return window, diag
