"""Fused fixed-radius neighborhood moments — Pallas TPU kernel.

The radius-mode LOAM correspondence fit needs, per query point, the
zeroth/first/second moments of its fixed-radius neighborhood
(lidar/registration.py:_radius_moments):

    n  = Σ_r [d²(q,r) < rad²],  m1 = Σ_r w·r,  m2 = Σ_r w·(r rᵀ)

The XLA path computes W = (d2 < rad²) as a [chunk, R] mask block and runs
``W @ aug`` — the mask block and the d² block are materialized between the
elementwise stage and the matmul (TPU matmuls read operands from buffers;
elementwise producers don't fuse into them), costing ~2 HBM passes over
[Q, R] per call. This kernel streams: each [TILE_Q, TILE_R] distance block
lives only in VMEM, is masked in registers, and the 13-column moment
accumulator [TILE_Q, 13] stays VMEM-resident across the ref-tile grid axis —
only queries, refs, and [Q, 13] moments ever touch HBM.

The [TILE_Q, TILE_R] @ [TILE_R, 13] moment contraction runs as 13 VPU
masked-reduction columns instead of an MXU dot (K=13 would waste 115/128 of
the systolic array, and Mosaic's dot does not support the package's
default HIGH precision anyway; the VPU form is exact f32).

MEASURED (v5e, round 4): the streaming design LOSES to the blocked-matmul
XLA form — 6.2 ms vs 3.3 ms at (Q=6144, R=30720) — because Mosaic lowers
the 13 per-column cross-lane reductions far less efficiently than XLA's
fused mask+GEMM (where the [chunk, R] mask feeds an MXU matmul whose K-dim
reduction is free). Same verdict as the kNN kernel (ops/pallas_knn.py): on
this hardware/toolchain the XLA paths win, so
``BEAM_SLAM_MOMENTS_BACKEND=xla`` is the default dispatch and this kernel
stays as tested infrastructure (per-element parity asserted in
tests/test_pallas_moments.py) for revisiting when Mosaic's reduction
lowering improves.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
TILE_R = 1024
_SENTINEL = 1.0e5


def _moments_kernel(q_ref, r_ref, m_out, *, rad2: float):
    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _():
        m_out[:] = jnp.zeros(m_out.shape, jnp.float32)

    q = q_ref[:]                                     # [TILE_Q, 3]
    r = r_ref[:]                                     # [TILE_R, 3]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)
    cross = (q[:, 0:1] * r[:, 0][None, :]
             + q[:, 1:2] * r[:, 1][None, :]
             + q[:, 2:3] * r[:, 2][None, :])         # exact f32 on the VPU
    d2 = q_sq + r_sq[None, :] - 2.0 * cross
    w = (d2 < rad2).astype(jnp.float32)              # [TILE_Q, TILE_R]

    # 13 moment columns: [1, x, y, z, xx, xy, xz, yx, yy, yz, zx, zy, zz]
    r0, r1, r2 = r[:, 0], r[:, 1], r[:, 2]
    cols = (jnp.ones_like(r0), r0, r1, r2,
            r0 * r0, r0 * r1, r0 * r2,
            r1 * r0, r1 * r1, r1 * r2,
            r2 * r0, r2 * r1, r2 * r2)
    acc = m_out[:]                                   # [TILE_Q, 13]
    contrib = [jnp.sum(w * c[None, :], axis=1) for c in cols]
    m_out[:] = acc + jnp.stack(contrib, axis=1)


@functools.partial(jax.jit, static_argnames=("rad", "interpret"))
def radius_moments(query: jnp.ndarray, ref: jnp.ndarray,
                   ref_valid: jnp.ndarray, rad: jnp.ndarray | float,
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(n [Q], centroid [Q,3], centered scatter S [Q,3,3]) of each query's
    fixed-radius neighborhood — same contract as the XLA `_radius_moments`.

    ``rad`` must be a static float here (kernel closure constant)."""
    rad = float(rad)
    Q = query.shape[0]
    R = ref.shape[0]
    Qp = pl.cdiv(Q, TILE_Q) * TILE_Q
    Rp = pl.cdiv(R, TILE_R) * TILE_R
    qpad = jnp.full((Qp, 3), _SENTINEL, jnp.float32).at[:Q].set(
        query.astype(jnp.float32))
    ref_masked = jnp.where(ref_valid[:, None], ref.astype(jnp.float32),
                           _SENTINEL)
    rpad = jnp.full((Rp, 3), _SENTINEL, jnp.float32).at[:R].set(ref_masked)

    grid = (Qp // TILE_Q, Rp // TILE_R)
    mom = pl.pallas_call(
        functools.partial(_moments_kernel, rad2=rad * rad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda qi, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_Q, 13), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, 13), jnp.float32),
        interpret=interpret,
    )(qpad, rpad)[:Q]

    n = mom[:, 0]
    safe_n = jnp.maximum(n, 1.0)
    c = mom[:, 1:4] / safe_n[:, None]
    S = (mom[:, 4:13].reshape(-1, 3, 3)
         - safe_n[:, None, None] * (c[:, :, None] * c[:, None, :]))
    return n, c, S
