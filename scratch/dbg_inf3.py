"""Trace the huge f64-only gradient elements at disparity_at_inf=1e-5."""
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from lightplane_tpu import lightplane_renderer_naive

import sys
sys.path.insert(0, "/root/repo")
from tests.test_renderer_parity import BASE, _setup

cfg = {**BASE, "n_rays": 20, "resolution": 5, "num_samples": 8,
       "num_samples_inf": 4, "disparity_at_inf": 1e-5}
seed = 0
rays, grid, _color, dp, kwargs = _setup(cfg, seed)
grid0 = grid[0]


def parts(fn, g, mlp, enc, dtype, kw):
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
    return [jnp.sum(p * o.astype(dtype)) for p, o in zip(projs, out)]


# per-output-term mlp gradients, f32 and f64
for dt, label in [(jnp.float32, "f32"), (jnp.float64, "f64")]:
    ctx = jax.enable_x64(True) if dt == jnp.float64 else None
    if ctx:
        ctx.__enter__()
    g0 = grid0.astype(dt)
    mp = dp.mlp_params.astype(dt)
    en = rays.encoding.astype(dt)
    for term, name in [(0, "depth"), (1, "nlt"), (2, "feat")]:
        gm = jax.grad(
            lambda g, m, e: parts(lightplane_renderer_naive, g, m, e, dt,
                                  kwargs)[term],
            argnums=1,
        )(g0, mp, en)
        gm = np.asarray(gm, np.float64)
        top = np.argsort(-np.abs(gm))[:4]
        print(f"{label}/{name}: max|g_mlp| {np.abs(gm).max():.4e} "
              f"top idx {top} vals {gm[top]}")
    # forward outputs too
    outs = parts(lightplane_renderer_naive, g0, mp, en, dt, kwargs)
    print(f"{label} loss terms:", [float(o) for o in outs])
    if ctx:
        ctx.__exit__(None, None, None)
