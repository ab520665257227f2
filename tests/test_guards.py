"""Post-backward finiteness guards (LIGHTPLANE_CHECK_GRADS).

TPU-native, opt-in equivalent of the reference's unconditional
``torch.isfinite`` asserts after each backward
(``lightplane_renderer.py:719-722``, ``lightplane_splatter.py:671-675``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightplane_tpu as lt
from tests.utils import random_decoder_params, random_grid, random_rays


def _render_grad(grid):
    rays = random_rays(jax.random.PRNGKey(0), 8, 1, encoding_dim=16)
    dp = random_decoder_params(jax.random.PRNGKey(1), input_chn=8,
                               hidden_chn=16, color_chn=3)

    def loss(g):
        d, nlt, f = lt.lightplane_renderer(
            rays, [g], dp, num_samples=6, gain=1.0, impl="scan"
        )
        return jnp.sum(f) + jnp.sum(d)

    return jax.grad(loss)(grid)


def test_guard_passes_on_finite(monkeypatch):
    monkeypatch.setenv("LIGHTPLANE_CHECK_GRADS", "1")
    grid = random_grid(jax.random.PRNGKey(2), 1, 8, resolution=4)[0]
    g = _render_grad(grid)
    assert np.all(np.isfinite(np.asarray(g)))


def test_guard_raises_on_nonfinite(monkeypatch):
    monkeypatch.setenv("LIGHTPLANE_CHECK_GRADS", "1")
    grid = random_grid(jax.random.PRNGKey(2), 1, 8, resolution=4)[0]
    grid = grid.at[0, 0, 0, 0, 0].set(jnp.nan)
    with pytest.raises(Exception, match="non-finite gradient"):
        g = _render_grad(grid)
        jax.block_until_ready(g)
        # callbacks may surface on a later sync point
        jax.effects_barrier()


def test_guard_off_is_silent():
    grid = random_grid(jax.random.PRNGKey(2), 1, 8, resolution=4)[0]
    grid = grid.at[0, 0, 0, 0, 0].set(jnp.nan)
    g = _render_grad(grid)  # no raise: guard disabled
    assert not np.all(np.isfinite(np.asarray(g)))


def test_guard_splatter(monkeypatch):
    monkeypatch.setenv("LIGHTPLANE_CHECK_GRADS", "1")
    rays = random_rays(jax.random.PRNGKey(0), 8, 1, encoding_dim=8)
    sizes = [(1, 4, 4, 4, 8)]

    def loss(enc):
        r = dataclasses.replace(rays, encoding=enc)
        out = lt.lightplane_splatter(
            r, sizes, num_samples=5, return_list=False
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(rays.encoding)
    assert np.all(np.isfinite(np.asarray(g)))
