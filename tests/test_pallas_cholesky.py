"""Parity tests for the fused batched Cholesky factor+solve kernel
(ops/pallas_cholesky.py) against jax.scipy.linalg.cho_solve.

On the CPU CI backend the kernel runs in interpreter mode; the real
Mosaic compile path is exercised by bench.py / the TPU session tools.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from beam_slam_tpu.ops import pallas_cholesky as pc


def _make_spd(key, B, N, cond=1e4):
    A = jax.random.normal(key, (B, N, N), jnp.float32)
    H = jnp.einsum("bij,bkj->bik", A, A) / N
    # push the conditioning around and keep SPD
    H = H + jnp.eye(N)[None] * (1.0 / cond)
    return H


def _reference(H, g):
    L = jnp.linalg.cholesky(H)
    return jax.vmap(lambda l, r: jax.scipy.linalg.cho_solve((l, True), r))(
        L, g)


@pytest.mark.parametrize("B,N", [(3, 128), (8, 256), (5, 640)])
def test_matches_cho_solve(B, N):
    key = jax.random.PRNGKey(0)
    H = _make_spd(key, B, N)
    g = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)
    x_ref = np.asarray(_reference(H, g))
    x = np.asarray(pc.cholesky_solve_batched(H, g, bc=4))
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x, x_ref, atol=2e-3 * scale, rtol=2e-3)


def test_residual_is_small():
    """Direct residual check ||Hx - g|| (independent of the XLA path)."""
    key = jax.random.PRNGKey(7)
    B, N = 4, 384
    H = _make_spd(key, B, N, cond=1e3)
    g = jax.random.normal(jax.random.PRNGKey(8), (B, N), jnp.float32)
    x = pc.cholesky_solve_batched(H, g)
    r = np.asarray(jnp.einsum("bij,bj->bi", H, x) - g)
    assert np.abs(r).max() < 1e-2 * np.abs(np.asarray(g)).max()


def test_batch_padding():
    """B not a multiple of bc pads with identity systems and trims."""
    key = jax.random.PRNGKey(3)
    B, N = 3, 128
    H = _make_spd(key, B, N)
    g = jax.random.normal(jax.random.PRNGKey(4), (B, N), jnp.float32)
    x8 = np.asarray(pc.cholesky_solve_batched(H, g, bc=8))
    x_ref = np.asarray(_reference(H, g))
    assert x8.shape == (B, N)
    np.testing.assert_allclose(x8, x_ref, atol=2e-3 * np.abs(x_ref).max(),
                               rtol=2e-3)
