"""Flax module layer tests: LightplaneRenderer / Splatter / MLPSplatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightplane_tpu as lt
from .utils import random_grid, random_rays


def _rays(key, n, enc_dim=None):
    return random_rays(key, n, 1, encoding_dim=enc_dim)


def test_renderer_module_forward_and_grad():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    m = lt.LightplaneRenderer(
        num_samples=6, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
        bg_color=1.0, opacity_init_bias=-2.0,
    )
    rays = _rays(k1, 10)
    grid = random_grid(k2, 1, 8, 5, "triplane")
    variables = m.init(k3, rays, grid)
    length, alpha, rgb = m.apply(variables, rays, grid)
    assert length.shape == (10,)
    assert alpha.shape == (10,)
    assert rgb.shape == (10, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    # alpha in [0, 1]
    a = np.asarray(alpha)
    assert (a >= -1e-5).all() and (a <= 1 + 1e-5).all()

    # gradients flow to both mlp params and the grid
    def loss(params, g):
        _, _, rgb = m.apply({"params": params}, rays, g)
        return jnp.sum(rgb**2)

    gp, gg = jax.grad(loss, argnums=(0, 1))(variables["params"], grid)
    assert float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(gp))
    ) > 0
    assert float(sum(jnp.sum(jnp.abs(x)) for x in gg)) > 0


def test_renderer_module_naive_matches_fused():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    rays = _rays(k1, 8)
    grid = random_grid(k2, 1, 8, 5, "voxel")
    kwargs = dict(
        num_samples=5, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
        opacity_init_bias=-2.0,
    )
    m_fused = lt.LightplaneRenderer(**kwargs)
    m_naive = lt.LightplaneRenderer(use_naive_impl=True, **kwargs)
    variables = m_fused.init(k3, rays, grid)
    out_f = m_fused.apply(variables, rays, grid)
    out_n = m_naive.apply(variables, rays, grid)
    for a, b in zip(out_f, out_n):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        )


def test_renderer_module_image_size_reorder():
    """image_size= internally tile-reorders rays; per-ray outputs must come
    back in the caller's raster order (rays are independent, so results
    match the unordered call exactly up to float associativity)."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = 16, 32  # divisible by the 8x32 tile -> a real permutation
    rays = _rays(k1, h * w)
    grid = random_grid(k2, 1, 8, 5, "triplane")
    m = lt.LightplaneRenderer(
        num_samples=5, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
        opacity_init_bias=-2.0,
    )
    variables = m.init(k3, rays, grid)
    out_plain = m.apply(variables, rays, grid)
    out_tiled = m.apply(variables, rays, grid, image_size=(h, w))
    for a, b in zip(out_plain, out_tiled):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )
    # mismatched ray count is rejected
    with pytest.raises(AssertionError):
        m.apply(variables, rays, grid, image_size=(h, w + 1))


def test_renderer_module_log_transmittance_and_overrides():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    rays = _rays(k1, 6)
    grid = random_grid(k2, 1, 8, 4, "voxel")
    m = lt.LightplaneRenderer(
        num_samples=4, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
    )
    variables = m.init(k3, rays, grid)
    _, alpha, _ = m.apply(variables, rays, grid)
    _, logt, _ = m.apply(
        variables, rays, grid, return_log_transmittance=True
    )
    np.testing.assert_allclose(
        np.asarray(alpha), 1 - np.exp(np.asarray(logt)), atol=1e-5
    )


def test_renderer_ray_encoding_validation():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    grid = random_grid(k2, 1, 8, 4, "voxel")
    m = lt.LightplaneRenderer(
        num_samples=4, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
    )
    rays_no_enc = _rays(k1, 6)
    variables = m.init(k3, rays_no_enc, grid)
    # module computes harmonic embedding -> passing an encoding must fail
    rays_with_enc = _rays(k1, 6, enc_dim=8)
    with pytest.raises(Exception):
        m.apply(variables, rays_with_enc, grid)


def test_scaffold_calculation():
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    rays = _rays(k1, 4)
    grid = random_grid(k2, 1, 8, 4, "voxel")
    m = lt.LightplaneRenderer(
        num_samples=4, color_chn=3, grid_chn=8, mlp_hidden_chn=8,
        opacity_init_bias=3.0,  # everything opaque -> scaffold all ones
    )
    variables = m.init(k3, rays, grid)
    scaffold = m.apply(
        variables, grid, (1, 6, 6, 6),
        method=lt.LightplaneRenderer.calculate_scaffold,
    )
    assert scaffold.shape == (1, 6, 6, 6)
    assert set(np.unique(np.asarray(scaffold))) <= {0.0, 1.0}
    assert np.asarray(scaffold).mean() > 0.9

    # rendering with the scaffold still works
    out = m.apply(variables, rays, grid, scaffold=scaffold)
    assert np.isfinite(np.asarray(out[2])).all()


def test_splatter_module():
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    rays = _rays(k1, 12, enc_dim=16)
    m = lt.LightplaneSplatter(num_samples=6, grid_chn=16)
    variables = m.init(k2, rays, [(1, 4, 4, 4, 16)])
    out = m.apply(variables, rays, [(1, 4, 4, 4, 16)])
    assert len(out) == 1 and out[0].shape == (1, 4, 4, 4, 16)
    assert np.isfinite(np.asarray(out[0])).all()
    assert float(jnp.sum(jnp.abs(out[0]))) > 0


def test_mlp_splatter_module():
    key = jax.random.PRNGKey(6)
    k1, k2, k3 = jax.random.split(key, 3)
    rays = _rays(k1, 12, enc_dim=8)
    input_grid = random_grid(k3, 1, 8, 4, "voxel")
    m = lt.LightplaneMLPSplatter(
        num_samples=6, grid_chn=16, input_grid_chn=8, mlp_hidden_chn=8,
    )
    variables = m.init(k2, rays, [(1, 4, 4, 4, 16)], input_grid)
    out = m.apply(variables, rays, [(1, 4, 4, 4, 16)], input_grid)
    assert out[0].shape == (1, 4, 4, 4, 16)

    def loss(params):
        o = m.apply({"params": params}, rays, [(1, 4, 4, 4, 16)],
                    input_grid)
        return jnp.sum(o[0] ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
    ) > 0
