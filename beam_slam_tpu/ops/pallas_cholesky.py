"""Batched Cholesky factor + solve as one fused Pallas TPU kernel.

Why this kernel exists (measured, round 5, TPU v5e):

    XLA's ``jnp.linalg.cholesky`` on a batched [B, 640, 640] SPD system is
    a *loop over the batch* of latency-bound blocked-Cholesky custom
    calls: 2.53 ms at B=8, 5.58 ms at B=32, 9.81 ms at B=64 — 74% of the
    whole damped Schur solve at B=32 (tools/profile_batched.py). The
    per-matrix FLOPs (N³/3 ≈ 87 MFLOP) are trivial; the time is
    per-element serial dependency chains that XLA cannot batch.

This kernel factors a CHUNK of matrices simultaneously: the sequential
column recurrence runs once, with every step's rank-1 update vectorized
across the whole chunk on the VPU ([Bc, 128, 128] per step), while the
O(N³) bulk (panel solves, trailing updates) runs on the MXU as per-batch
128-tiles. The forward/backward substitution for the single RHS is fused
into the same kernel, so one pallas_call replaces XLA's
cholesky + triangular-solve custom-call chain entirely.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * the [Bc, N, N] block lives in VMEM (Bc=8, N=640 → 13 MB); the grid
    runs over batch chunks and Pallas pipelines the HBM→VMEM block copies;
  * the diagonal tile stays SYMMETRIC through the rank-1 recurrence, so
    "column j" is read as ROW j — a cheap sublane index, never a dynamic
    lane slice;
  * per-batch MXU matmuls are a STATIC python unroll over Bc (Mosaic's 2-D
    ``jnp.dot``); batched ``dot_general`` batch dims are avoided.

Numerics: plain f32 (``preferred_element_type=f32``) — bit-comparable to
the XLA path, validated against ``jax.scipy.linalg.cho_solve`` in
tests/test_pallas_cholesky.py.

Reference context: this is the per-iteration reduced-camera-system solve
of the fixed-lag smoother / submap refinement
(bs_optimizers/src/fixed_lag_smoother.cpp:281 optimizes with Ceres
SPARSE_NORMAL_CHOLESKY; bs_models/src/lib/global_mapping/
submap_refinement.cpp:24-162 is the batched workload).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128  # panel width = MXU tile


LEAF = 32  # unblocked leaf width inside a 128 tile


def _factor_leaf(T, Bc):
    """Unblocked factor of the SPD leaf T [Bc, LEAF, LEAF] -> Lt with
    Lt[:, j, :] = column j of L (the diagonal sits at lane j of row j).

    The leaf stays symmetric through the outer-product recurrence, so
    column j of the remaining submatrix equals ROW j — always a sublane
    read, never a dynamic LANE index (the classic Mosaic trap). The pivot
    is extracted with a one-hot lane reduction for the same reason.
    """
    jj = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)[:, 0]

    def step(j, carry):
        # Mosaic cannot lower dynamic_slice on VALUES inside the loop, so
        # row extraction and the row write are mask reductions / selects.
        T, Lt = carry
        sub = (jj == j)
        lane = sub.astype(T.dtype)
        rowj = jnp.sum(T * lane[None, :, None], axis=1)       # [Bc, LEAF]
        piv = jnp.sum(rowj * lane[None, :], axis=1)           # [Bc]
        piv = jnp.maximum(piv, 1e-20)
        dinv = jax.lax.rsqrt(piv)
        col = rowj * dinv[:, None]
        col = jnp.where((jj >= j)[None, :], col, 0.0)
        Lt = jnp.where(sub[None, :, None], col[:, None, :], Lt)
        T = T - col[:, :, None] * col[:, None, :]
        return T, Lt

    _, Lt = jax.lax.fori_loop(0, LEAF, step, (T, jnp.zeros_like(T)))
    return Lt


def _invert_leaf(Lt, Bc):
    """Invert the leaf factor (W = L^{-1}, lower) by vectorized forward
    substitution on the identity: W[j,:] = (e_j - L[j,:j] @ W[:j,:]) / d_j.
    Row j of L comes from Lt via a one-hot lane reduction."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0)[:, 0]

    def step(j, W):
        sub = (jj == j)
        lane = sub.astype(Lt.dtype)
        Lrow = jnp.sum(Lt * lane[None, None, :], axis=2)       # [Bc, LEAF]
        dj = jnp.sum(Lrow * lane[None, :], axis=1)             # [Bc]
        Lrow = jnp.where((jj < j)[None, :], Lrow, 0.0)
        acc = jnp.sum(Lrow[:, :, None] * W, axis=1)            # [Bc, LEAF]
        wj = (lane[None, :] - acc) / dj[:, None]
        return jnp.where(sub[None, :, None], wj[:, None, :], W)

    return jax.lax.fori_loop(0, LEAF, step, jnp.zeros_like(Lt))


def _factor_invert_tile(T, Bc):
    """Blocked factor+inverse of the SPD tile T [Bc, NB, NB]:
    returns W = L^{-1} (lower) where T = L L^T.

    One level of recursive blocking (LEAF-wide panels): the serial
    recurrences run on [Bc, LEAF, LEAF] leaves (16x less VPU element work
    than naive 128-wide rank-1), everything else is MXU 32/96-tiles. The
    full-tile inverse is assembled block-column-wise from the leaf
    inverses:  W[i, j] = -W[i, i] · Σ_{k=j..i-1} L[i, k] · W[k, j].
    """
    m = NB // LEAF
    # factor: leaf diag + MXU panel solve + MXU trailing update. The
    # trailing submatrix is carried as a shrinking VALUE (static shapes per
    # python-loop step) — Mosaic has no scatter-add for .at[].add updates.
    Wd = [None] * m          # leaf diag inverses [Bc, LEAF, LEAF]
    Lb = {}                  # below-diagonal L blocks [Bc, LEAF, LEAF]
    rest = T
    for p in range(m):
        Td = rest[:, :LEAF, :LEAF]
        Lt = _factor_leaf(Td, Bc)
        W32 = _invert_leaf(Lt, Bc)
        Wd[p] = W32
        if p + 1 < m:
            below = rest[:, LEAF:, :LEAF]                     # [Bc, R, 32]
            P = _bmm(below, jnp.swapaxes(W32, 1, 2), Bc)
            for q in range(p + 1, m):
                Lb[(q, p)] = P[:, (q - p - 1) * LEAF:(q - p) * LEAF, :]
            rest = rest[:, LEAF:, LEAF:] - _bmm(
                P, jnp.swapaxes(P, 1, 2), Bc)

    # assemble W (block lower triangular) row by row
    Wblk = {}
    rows = []
    for i in range(m):
        row = []
        for j in range(m):
            if i == j:
                row.append(Wd[i])
            elif i < j:
                row.append(jnp.zeros_like(Wd[i]))
            else:
                acc = None
                for k in range(j, i):
                    Wkj = Wd[k] if k == j else Wblk[(k, j)]
                    term = _bmm(Lb[(i, k)], Wkj, Bc)
                    acc = term if acc is None else acc + term
                row.append(-_bmm(Wd[i], acc, Bc))
        rows.append(row)
        for j in range(i):
            Wblk[(i, j)] = rows[i][j]
    return jnp.concatenate(
        [jnp.concatenate(r, axis=2) for r in rows], axis=1)


def _bmm(x, y, Bc):
    """[Bc, m, k] @ [Bc, k, n] as a static per-batch MXU unroll.

    precision=HIGHEST: full-f32 MXU passes — the factor feeds a direct
    solver, bf16 products would cost digits; Mosaic also rejects the
    ambient HIGH default outright."""
    return jnp.stack([
        jnp.dot(x[b], y[b], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for b in range(Bc)])


def _bmv(m, v, Bc):
    """[Bc, r, c] @ [Bc, c] -> [Bc, r]."""
    return jnp.stack([
        jnp.dot(m[b], v[b], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for b in range(Bc)])


def _chol_solve_kernel(H_ref, g_ref, x_ref, winv_ref, y_ref, *, N, Bc):
    nb = N // NB

    # ---- factor in place: H_ref becomes L (block lower triangle valid)
    for k in range(nb):
        ck = k * NB
        T = H_ref[:, ck:ck + NB, ck:ck + NB]
        W = _factor_invert_tile(T, Bc)
        winv_ref[:, ck:ck + NB, :] = W
        if k + 1 < nb:
            below = H_ref[:, ck + NB:, ck:ck + NB]            # [Bc, R, 128]
            # panel solve: P = below @ W^T  (solve P L^T = below)
            Wt = jnp.swapaxes(W, 1, 2)
            P = _bmm(below, Wt, Bc)
            H_ref[:, ck + NB:, ck:ck + NB] = P
            # trailing update: H[below, below] -= P @ P^T (full square;
            # only the lower triangle is read afterwards)
            H_ref[:, ck + NB:, ck + NB:] = (
                H_ref[:, ck + NB:, ck + NB:] - _bmm(
                    P, jnp.swapaxes(P, 1, 2), Bc))

    # ---- forward substitution: y = L^{-1} g (blocked, Winv tiles)
    for k in range(nb):
        ck = k * NB
        rhs = g_ref[:, ck:ck + NB]
        for j in range(k):
            cj = j * NB
            Lkj = H_ref[:, ck:ck + NB, cj:cj + NB]
            rhs = rhs - _bmv(Lkj, y_ref[:, cj:cj + NB], Bc)
        Wk = winv_ref[:, ck:ck + NB, :]
        y_ref[:, ck:ck + NB] = _bmv(Wk, rhs, Bc)

    # ---- backward substitution: x = L^{-T} y
    for k in reversed(range(nb)):
        ck = k * NB
        rhs = y_ref[:, ck:ck + NB]
        for j in range(k + 1, nb):
            cj = j * NB
            Ljk = H_ref[:, cj:cj + NB, ck:ck + NB]            # [Bc,128,128]
            rhs = rhs - _bmv(jnp.swapaxes(Ljk, 1, 2),
                             x_ref[:, cj:cj + NB], Bc)
        Wk = winv_ref[:, ck:ck + NB, :]
        x_ref[:, ck:ck + NB] = _bmv(jnp.swapaxes(Wk, 1, 2), rhs, Bc)


@functools.partial(jax.jit, static_argnames=("bc",))
def cholesky_solve_batched(H: jnp.ndarray, g: jnp.ndarray,
                           bc: int = 8) -> jnp.ndarray:
    """Solve H x = g for a batch of SPD systems with one fused kernel.

    H: [B, N, N] SPD (damped + equilibrated by the caller), N % 128 == 0.
    g: [B, N]. Returns x [B, N] in f32.

    The grid runs over ceil(B / bc) chunks of ``bc`` matrices; each chunk
    is factored with the batch-vectorized recurrence (docstring above).
    B is padded up to a multiple of ``bc`` with identity systems.
    """
    B, N = g.shape
    if N % NB != 0:
        raise ValueError(f"N={N} must be a multiple of {NB}")
    Bp = ((B + bc - 1) // bc) * bc
    if Bp != B:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=H.dtype), (Bp - B, N, N))
        H = jnp.concatenate([H, eye], axis=0)
        g = jnp.concatenate([g, jnp.zeros((Bp - B, N), g.dtype)], axis=0)

    kernel = functools.partial(_chol_solve_kernel, N=N, Bc=bc)
    x = pl.pallas_call(
        kernel,
        grid=(Bp // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bc, N, NB), jnp.float32),   # Winv diag tiles
            pltpu.VMEM((bc, N), jnp.float32),       # y workspace
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        # CPU CI backend: run interpreted (Mosaic is TPU-only); the real
        # compile path is exercised on the chip by bench.py
        interpret=jax.default_backend() != "tpu",
    )(H, g)
    return x[:B]
