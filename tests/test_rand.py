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


def test_tile_ray_order_roundtrip():
    """tile_ray_order is a permutation; inverse restores raster order;
    non-divisible images fall back to identity."""
    import numpy as np

    import lightplane_tpu as lt

    order, inv = lt.tile_ray_order(16, 64)
    n = 16 * 64
    assert sorted(order.tolist()) == list(range(n))
    assert (order[inv] == np.arange(n)).all()
    # each 256-ray block covers exactly one 8x32 pixel tile
    rows, cols = order[:256] // 64, order[:256] % 64
    assert rows.max() - rows.min() == 7 and cols.max() - cols.min() == 31
    o2, i2 = lt.tile_ray_order(10, 30)  # not divisible -> identity
    assert (o2 == np.arange(300)).all()
