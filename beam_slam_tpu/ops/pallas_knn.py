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

Measured on one v5e chip (round 4, packed-key variant below):
(Q=2112, R=21120, k=5): pallas 8.8 ms vs XLA approx_max_k 5.2 ms;
(Q=6144, R=30720, k=10): pallas 29 ms vs XLA 2.9 ms. The XLA path wins
decisively because the TPU's PartialReduce (approx_max_k) fuses with the
distance matmul — the d2 matrix never costs a separate HBM pass there
either, and its hardware top-k needs no VPU extraction passes. The packed
single-min extraction (index bits in the mantissa LSBs) already halved the
per-pass cost vs min+argmin+where; the remaining gap is Mosaic's cross-lane
reduce_min lowering vs the fused PartialReduce, so ``backend="auto"``
resolves to XLA and the kernel stays as tested infrastructure
(BEAM_SLAM_KNN_BACKEND=pallas).
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


_IDX_BITS = 17          # global ref index bits (R <= 131072)
_IDX_MASK = (1 << _IDX_BITS) - 1
_KEY_INF = 0x7F000000   # huge f32 bit pattern with zeroed index bits


def _knn_kernel(q_ref, r_ref, k_out, *, k: int):
    """Packed-key top-k: for d2 >= 0, the IEEE-754 bit pattern compares like
    the float, so (bits(d2) & ~IDX_MASK) | global_col is an int32 key whose
    MIN is simultaneously the min distance AND its ref index — one VPU min
    per extraction pass instead of min + argmin + masked where (the 3-pass
    variant measured 10.6 ms vs XLA's 6.4 ms at the registration shapes).
    The low ``_IDX_BITS`` mantissa bits are truncated from the distance
    (relative error 2^(17-23) ≈ 1.6%): neighbors whose distances agree
    within that may swap rank or collapse to one slot — irrelevant for the
    line/plane *fits* this search feeds, which only consume neighborhood
    moments. The unpacked distances carry the same truncation; the
    max_corr_dist gate is orders of magnitude coarser."""
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        k_out[:] = jnp.full(k_out.shape, _KEY_INF, jnp.int32)

    q = q_ref[:]                                     # [TILE_Q, 3]
    r = r_ref[:]                                     # [TILE_R, 3]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)
    # cross term as 3 VPU outer products: exact f32 (no bf16 coordinate
    # truncation), and a K=3 MXU dot would waste 125/128 of the systolic
    # array anyway
    cross = (q[:, 0:1] * r[:, 0][None, :]
             + q[:, 1:2] * r[:, 1][None, :]
             + q[:, 2:3] * r[:, 2][None, :])
    d2 = jnp.maximum(q_sq + r_sq[None, :] - 2.0 * cross, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + ri * TILE_R
    keys = (jax.lax.bitcast_convert_type(d2, jnp.int32)
            & jnp.int32(~_IDX_MASK)) | col           # [TILE_Q, TILE_R]

    # this block's k best keys (k single-min passes), merged with the
    # running top-k carried in the VMEM-resident output tile
    blk = []
    for _ in range(k):
        m = jnp.min(keys, axis=1)
        blk.append(m)
        keys = jnp.where(keys == m[:, None], jnp.int32(_KEY_INF), keys)
    cand = jnp.concatenate([k_out[:], jnp.stack(blk, axis=1)], axis=1)
    out = []
    for _ in range(k):
        m = jnp.min(cand, axis=1)
        out.append(m)
        cand = jnp.where(cand == m[:, None], jnp.int32(_KEY_INF), cand)
    k_out[:] = jnp.stack(out, axis=1)


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

    assert Rp <= (1 << _IDX_BITS), "packed-key kNN supports R <= 131072"
    grid = (Qp // TILE_Q, Rp // TILE_R)
    k_arr = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda qi, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_Q, k), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        interpret=interpret,
    )(qpad, rpad)
    k_arr = k_arr[:Q]
    idx = (k_arr & _IDX_MASK).astype(jnp.int32)
    d2 = jax.lax.bitcast_convert_type(k_arr & jnp.int32(~_IDX_MASK),
                                      jnp.float32)
    idx = jnp.minimum(idx, R - 1)  # sentinel slots decode in-range
    return idx, d2
