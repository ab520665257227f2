"""Probe the windowed-tile grad_mlp discrepancy on TPU: bf16 noise or bug?"""
import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras
from tests.utils import random_decoder_params, random_grid


def _camera_tile_rays(h, w, tile, enc_dim, near=1.0, far=4.0, seed=0):
    cams = sphere_cameras(8, radius=2.5, elevation_deg=25.0)
    o, d = camera_rays(cams[3], h, w, w * 1.1, near, far)
    order, _inv = lt.tile_ray_order(h, w, tile=tile)
    o, d = o[order], d[order]
    n = h * w
    return lt.Rays(
        directions=jnp.asarray(d), origins=jnp.asarray(o),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), near), far=jnp.full((n,), far),
        encoding=jax.random.normal(jax.random.PRNGKey(seed), (n, 32)) * 0.1,
    )


def main():
    dp = random_decoder_params(jax.random.PRNGKey(1), input_chn=32,
                               hidden_chn=32)
    rays = _camera_tile_rays(32, 64, (8, 32), 32)
    grid = random_grid(jax.random.PRNGKey(2), 1, 32, 32, "triplane",
                       scale=0.3)

    def loss(impl, g, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        dpp = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(r, g, dpp, impl=impl, num_samples=32,
                                     gain=1.0)
        k = jax.random.PRNGKey(7)
        projs = [jax.random.normal(kk, o.shape)
                 for kk, o in zip(jax.random.split(k, 3), out)]
        return sum(jnp.sum(p * o) for p, o in zip(projs, out))

    res = {}
    for impl in ("scan", "pallas"):
        g = jax.jit(jax.grad(functools.partial(loss, impl), argnums=(1,)))(
            grid, dp.mlp_params, rays.encoding)
        res[impl] = np.asarray(g[0])
    a, b = res["scan"], res["pallas"]
    adiff = np.abs(a - b)
    denom = 0.5 * (np.abs(a) + np.abs(b)) + 1e-4
    rel = adiff / denom
    print("mlp grad: n", a.size, "|a| mean", np.abs(a).mean(),
          "max", np.abs(a).max())
    print("absdiff max", adiff.max(), "mean", adiff.mean())
    print("rel mean", rel.mean(), "rel max", rel.max())
    # where is the rel concentrated? bucket by |a| magnitude
    mags = np.abs(a)
    for lo, hi in [(0, 1e-4), (1e-4, 1e-2), (1e-2, 1), (1, 1e9)]:
        m = (mags >= lo) & (mags < hi)
        if m.sum():
            print(f"|a| in [{lo:g},{hi:g}): n={m.sum():5d} "
                  f"rel_mean={rel[m].mean():.3e} abs_mean={adiff[m].mean():.3e}")
    # offsets: which MLP the worst entries live in
    worst = np.argsort(rel)[-10:]
    print("worst idx:", worst, "rel:", rel[worst], "a:", a[worst],
          "b:", b[worst])


if __name__ == "__main__":
    main()
