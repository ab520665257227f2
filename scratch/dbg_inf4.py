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
rays, grid, _c, dp, kwargs = _setup(cfg, 0)


def run(dt):
    rays_l = dataclasses.replace(
        rays,
        directions=rays.directions.astype(dt),
        origins=rays.origins.astype(dt),
        near=rays.near.astype(dt),
        far=rays.far.astype(dt),
        encoding=rays.encoding.astype(dt),
    )
    return lightplane_renderer_naive(
        rays_l, [grid[0].astype(dt)],
        dataclasses.replace(dp, mlp_params=dp.mlp_params.astype(dt)),
        **kwargs)


d32, n32, f32_ = run(jnp.float32)
with jax.enable_x64(True):
    d64, n64, f64_ = run(jnp.float64)
np.set_printoptions(precision=6, suppress=False, linewidth=120)
print("nlt32:", np.asarray(n32))
print("nlt64:", np.asarray(n64))
print("d32:", np.asarray(d32))
print("d64:", np.asarray(d64))
