"""Fused k-nearest-neighbor top-k — Pallas TPU kernel for the registration
correspondence search.

The LOAM/ICP/GICP correspondence step is `argmin_k ||q - r||²` of every scan
point against the map (lidar/registration.py:_knn, lidar/matchers.py:_knn).
The XLA path materializes the full [Q, R] distance matrix in HBM
(Q≈2k, R≈20k → ~180 MB of traffic per GN iteration) and then runs a
sort-based top_k over it. This kernel never writes the distance matrix:

  * 2D grid (query tiles × ref tiles); each [TILE_Q, TILE_R] distance block
    comes from one MXU matmul (−2·q·rᵀ) plus VPU norms and lives only in
    VMEM/registers;
  * per block, the k best are extracted with k VPU min/argmin passes and
    merged into the output tile (which stays VMEM-resident across the inner
    ref-tile grid dimension — the standard accumulation pattern);
  * only [Q, k] distances/indices ever reach HBM.

Invalid ref points are pre-masked to a far sentinel coordinate on the host
side of the call, so the kernel needs no validity plumbing; downstream
correspondence gating (max_corr_dist) rejects sentinel hits.

CPU fallback: ``backend="xla"`` is the reference path; tests assert
agreement via ``interpret=True``.

Measured on one TPU chip (Q=2112, R=21120, k=10): pallas 10.6 ms vs XLA
matmul+top_k 6.4 ms — the exact per-block k-pass extraction is
compute-bound (k·Q·R VPU ops) and loses to XLA's fused sort at these sizes,
so ``backend="auto"`` currently resolves to XLA; the kernel stays available
(env BEAM_SLAM_KNN_BACKEND=pallas) for traffic-bound regimes (very large
maps / co-scheduled memory-bound kernels) and as the base for an O(log)
bitonic in-block top-k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
TILE_R = 512
_INF = 3.4e38  # plain float: jnp scalars become captured consts in kernels
_SENTINEL = 1.0e5  # "very far away" coordinate for invalid/padded refs


def _knn_kernel(q_ref, r_ref, d_out, i_out, *, k: int):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        d_out[:] = jnp.full(d_out.shape, _INF, jnp.float32)
        i_out[:] = jnp.zeros(i_out.shape, jnp.int32)

    q = q_ref[:]                                     # [TILE_Q, 3]
    r = r_ref[:]                                     # [TILE_R, 3]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)
    cross = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
    d2 = q_sq + r_sq[None, :] - 2.0 * cross          # [TILE_Q, TILE_R]
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    # this block's k best (min + mask-out, k passes on the VPU)
    blk_d = []
    blk_i = []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        a = jnp.argmin(d2, axis=1).astype(jnp.int32)
        blk_d.append(m)
        blk_i.append(ri * TILE_R + a)
        d2 = jnp.where(col == a[:, None], _INF, d2)

    cand_d = jnp.concatenate([d_out[:], jnp.stack(blk_d, axis=1)], axis=1)
    cand_i = jnp.concatenate([i_out[:], jnp.stack(blk_i, axis=1)], axis=1)
    ccol = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    out_d = []
    out_i = []
    for _ in range(k):
        m = jnp.min(cand_d, axis=1)
        a = jnp.argmin(cand_d, axis=1)
        sel = ccol == a[:, None]
        out_d.append(m)
        # one-hot select instead of gather (Mosaic's gather lowering only
        # supports full-shape indices)
        out_i.append(jnp.sum(jnp.where(sel, cand_i, 0), axis=1))
        cand_d = jnp.where(sel, _INF, cand_d)
    d_out[:] = jnp.stack(out_d, axis=1)
    i_out[:] = jnp.stack(out_i, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "backend", "interpret"))
def knn_topk(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
             k: int, backend: str = "auto",
             interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest refs per query point: (idx [Q,k], d2 [Q,k]). Invalid refs
    surface as ~1e10 distances (sentinel hits) — gate with max_corr_dist.

    ``backend``:
      * "xla" (the "auto" default) — one distance matmul + TPU-native
        ``approx_max_k`` (per-element recall ≥ ~0.95; exact on backends
        without the TPU PartialReduce op). Measured at the registration
        shapes (Q=6144, R=61440, k=10): 0.74 ms vs 18.5 ms for the exact
        sort-based ``top_k`` — the correspondence search only feeds
        line/plane *fits*, which are insensitive to an occasionally
        swapped 9th/10th neighbor;
      * "xla_exact" — matmul + exact ``top_k`` (the reference-fidelity
        kd-tree-equivalent path; used by the agreement tests);
      * "pallas" — the fused kernel below.
    """
    if backend == "auto":
        import os
        backend = os.environ.get("BEAM_SLAM_KNN_BACKEND", "xla")
        if backend == "pallas" and jax.default_backend() != "tpu":
            backend = "xla"
    if backend in ("xla", "xla_exact") and not interpret:
        d2 = (jnp.sum(query * query, axis=1, keepdims=True)
              + jnp.sum(ref * ref, axis=1)[None, :]
              - 2.0 * query @ ref.T)
        d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
        if backend == "xla" and jax.default_backend() == "tpu":
            neg, idx = jax.lax.approx_max_k(-d2, k)
        else:
            neg, idx = jax.lax.top_k(-d2, k)
        return idx, -neg

    Q = query.shape[0]
    R = ref.shape[0]
    Qp = pl.cdiv(Q, TILE_Q) * TILE_Q
    Rp = pl.cdiv(R, TILE_R) * TILE_R
    qpad = jnp.zeros((Qp, 3), jnp.float32).at[:Q].set(
        query.astype(jnp.float32))
    ref_masked = jnp.where(ref_valid[:, None], ref.astype(jnp.float32),
                           _SENTINEL)
    rpad = jnp.full((Rp, 3), _SENTINEL, jnp.float32).at[:R].set(ref_masked)

    grid = (Qp // TILE_Q, Rp // TILE_R)
    d_arr, i_arr = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda qi, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ],
        interpret=interpret,
    )(qpad, rpad)
    return i_arr[:Q].astype(jnp.int32), d_arr[:Q]
