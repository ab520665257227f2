"""Which (tile, block) shape wins at small images? Prints fit + speed."""
import sys, time

sys.path.insert(0, "/root/repo")

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from benchmarks.renderer_speed import make_inputs

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128

fits_seen = {}
orig = rp._w2_plan


def spy(*a, **kw):
    w0, fits = orig(*a, **kw)
    fits_seen["v"] = fits
    return w0, fits


rp._w2_plan = spy

for tile in [(8, 32), (16, 16), (8, 16), (8, 8)]:
    if SIZE % tile[0] or SIZE % tile[1]:
        continue
    rays, grid, dp = make_inputs(
        jax.random.PRNGKey(0), SIZE, tile_order=True, tile=tile)
    tr = tile[0] * tile[1]

    def loss(g, mp, enc, tr=tr, rays=rays, dp=dp):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            r, g, d, num_samples=256, gain=1.0, impl="pallas",
            tile_rays=tr)
        return sum(jnp.sum(o) for o in out)

    # eager run captures a concrete fit flag from the spy
    fits_seen.clear()
    _ = lt.lightplane_renderer(
        rays, grid, dp, num_samples=256, gain=1.0, impl="pallas",
        tile_rays=tr)
    fit = bool(np.asarray(fits_seen.get("v", False)))

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    out = f(grid, dp.mlp_params, rays.encoding)
    jax.block_until_ready(out)

    def chain(n):
        g = grid
        for _ in range(n):
            gg, gm, ge = f(g, dp.mlp_params, rays.encoding)
            g = [a + b * 1e-30 for a, b in zip(g, gg)]
        return np.asarray(gm[:1])

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(6); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 5
    n = SIZE * SIZE
    print(f"tile={tile} block={tr}: w2_fits={fit} "
          f"fwbw {dt*1e3:.1f} ms = {n/dt:.0f} rays/s")
