"""Does the rewritten box plan fit the test_tpu_splatter_big config?"""
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras
from lightplane_tpu.ops.kernels import splatter_big as sb
from lightplane_tpu.ops.splatter import _SplatCfg


def tile_rays(h, w, tile, enc_dim, near=1.0, far=4.0, seed=0, cam=3):
    cams = sphere_cameras(8, radius=2.5, elevation_deg=25.0)
    o, d = camera_rays(cams[cam], h, w, w * 1.1, near, far)
    order, _inv = lt.tile_ray_order(h, w, tile=tile)
    o, d = o[order], d[order]
    n = h * w
    return lt.Rays(
        directions=jnp.asarray(d),
        origins=jnp.asarray(o),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), near),
        far=jnp.full((n,), far),
        encoding=jax.random.normal(jax.random.PRNGKey(seed), (n, 8)) * 0.1,
    )


sizes = ((1, 64, 64, 64, 8),)
cfg = _SplatCfg(
    num_samples=12, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, output_grid_sizes=sizes,
    input_grid_sizes=None, n_hidden=(),
)
print("supported:", sb.big_splat_supported(cfg))
print("geos:", sb.sb_geos(cfg))

for cam in range(8):
    rays = tile_rays(32, 32, (8, 8), 8, cam=cam)
    valid = jnp.ones((rays.directions.shape[0],), jnp.float32)
    geom = (rays.directions, rays.origins, rays.near, rays.far,
            rays.grid_idx.astype(jnp.int32), valid)
    arrs, _v, _R, _Rp = sb._ray_arrs(geom, rays.encoding)
    w0, fits, K, n = jax.jit(
        lambda o, d, nr, fr: sb.box_plan(cfg, o, d, nr, fr)
    )(arrs[0], arrs[1], arrs[2][:, 0], arrs[3][:, 0])
    print(f"cam {cam}: fits={bool(fits)} K={K} n_chunks={n}")
