"""Fused Pallas radius-moments kernel vs the XLA reference (interpret mode
on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.lidar.registration import _radius_moments
from beam_slam_tpu.ops.pallas_moments import radius_moments


@pytest.mark.parametrize("Q,R,rad", [(300, 1000, 0.4), (64, 2048, 0.3),
                                     (257, 513, 1.0)])
def test_pallas_moments_matches_xla(Q, R, rad):
    rng = np.random.default_rng(Q + R)
    q = jnp.asarray(rng.uniform(-5, 5, (Q, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-5, 5, (R, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random(R) > 0.2)
    n_x, c_x, S_x = _radius_moments(q, r, valid, rad)
    n_p, c_p, S_p = radius_moments(q, r, valid, rad, interpret=True)
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_p))
    has = np.asarray(n_x) > 0
    np.testing.assert_allclose(np.asarray(c_p)[has], np.asarray(c_x)[has],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(S_p)[has], np.asarray(S_x)[has],
                               atol=5e-3)


def test_pallas_moments_empty_neighborhood():
    """Queries with no neighbors inside the radius: n = 0, centroid and
    scatter well-defined zeros."""
    q = jnp.asarray([[100.0, 100.0, 100.0]], jnp.float32)
    r = jnp.asarray(np.zeros((64, 3), np.float32))
    valid = jnp.ones(64, bool)
    n, c, S = radius_moments(q, r, valid, 0.5, interpret=True)
    assert float(n[0]) == 0.0
    assert np.isfinite(np.asarray(c)).all()
    assert np.isfinite(np.asarray(S)).all()
