"""Where does the disparity_at_inf=1e-5 grid-gradient error live?

Compares grid gradients from:
  (a) naive f64 (truth)
  (b) naive f32 (plain autodiff, no rewind)
  (c) fused scan f32 (rewind main + autodiff tail after the round-3 split)
  (d) fused scan f32 main-only (num_samples_inf=0) vs naive f32 main-only
"""
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from lightplane_tpu import lightplane_renderer, lightplane_renderer_naive

import sys
sys.path.insert(0, "/root/repo")
from tests.test_renderer_parity import BASE, _setup

cfg = {**BASE, "n_rays": 20, "resolution": 5, "num_samples": 8,
       "num_samples_inf": 4, "disparity_at_inf": 1e-5}
seed = 0
rays, grid, _color, dp, kwargs = _setup(cfg, seed)
grid0 = grid[0]


def loss(fn, g, mlp, enc, dtype, kw):
    rays_l = dataclasses.replace(
        rays,
        directions=rays.directions.astype(dtype),
        origins=rays.origins.astype(dtype),
        near=rays.near.astype(dtype),
        far=rays.far.astype(dtype),
        encoding=enc,
    )
    out = fn(rays_l, [g], dataclasses.replace(dp, mlp_params=mlp), **kw)
    k = jax.random.PRNGKey(1000 + seed)
    projs = [
        jax.random.normal(kk, o.shape).astype(dtype)
        for kk, o in zip(jax.random.split(k, 3), out)
    ]
    return sum(jnp.sum(p * o.astype(dtype)) for p, o in zip(projs, out))


def gradfn(fn, dtype, kw):
    return jax.grad(lambda *a: loss(fn, *a, dtype, kw), argnums=(0, 1, 2))


g_f32_naive = gradfn(lightplane_renderer_naive, jnp.float32, kwargs)(
    grid0, dp.mlp_params, rays.encoding)
g_f32_fused = gradfn(lightplane_renderer, jnp.float32, kwargs)(
    grid0, dp.mlp_params, rays.encoding)

with jax.enable_x64(True):
    g_f64 = gradfn(lightplane_renderer_naive, jnp.float64, kwargs)(
        grid0.astype(jnp.float64),
        dp.mlp_params.astype(jnp.float64),
        rays.encoding.astype(jnp.float64),
    )


def rel(a, b, name):
    x, y = np.asarray(a, np.float64), np.asarray(b, np.float64)
    adiff = np.abs(x - y)
    floor = 10.0 * adiff.mean() + 1e-7
    sel = np.maximum(np.abs(x), np.abs(y)) >= floor
    r = adiff[sel] / (0.5 * (np.abs(x[sel]) + np.abs(y[sel])) + 1e-4)
    print(f"{name}: maxabs {adiff.max():.3e} mean {adiff.mean():.3e} "
          f"rel {r.mean():.3e} over {sel.sum()}")


for nm, a, b in zip(["grid", "mlp", "enc"], g_f64, g_f32_naive):
    rel(a, b, f"naive_f32_vs_f64/{nm}")
for nm, a, b in zip(["grid", "mlp", "enc"], g_f64, g_f32_fused):
    rel(a, b, f"fused_f32_vs_f64/{nm}")
for nm, a, b in zip(["grid", "mlp", "enc"], g_f32_naive, g_f32_fused):
    rel(a, b, f"fused_vs_naive_f32/{nm}")
