"""Statistical test of the counter-based Gaussian RNG
(mirrors reference ``tests/test_randn.py:30-45``)."""

import jax.numpy as jnp
import numpy as np

from lightplane_tpu import int_to_randn


def test_randn_statistics():
    n = 100_000
    for seed in range(10):
        i1 = jnp.arange(n, dtype=jnp.int32)
        i2 = i1 + n
        z = np.asarray(int_to_randn(i1, i2, seed))
        assert np.isfinite(z).all()
        assert abs(z.mean()) <= 0.015
        assert abs(z.std() - 1.0) <= 0.015


def test_randn_deterministic():
    i1 = jnp.arange(1000, dtype=jnp.int32)
    i2 = i1 + 1000
    a = np.asarray(int_to_randn(i1, i2, 7))
    b = np.asarray(int_to_randn(i1, i2, 7))
    c = np.asarray(int_to_randn(i1, i2, 8))
    assert (a == b).all()
    assert not np.allclose(a, c)
