"""W3 window-plan fit rate over 120 orbit poses (5 elevations x 24
azimuths) at the big-voxel bench config, for the current W3 budget env.
Usage: [LT_W3_* env] python scratch/probe_w3_fit.py [tile_h tile_w]
"""
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from lightplane_tpu.ops.kernels import renderer_w3 as rw3
from lightplane_tpu.ops.renderer import _RenderCfg
from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras

size, res, chn, ns = 256, 64, 32, 256
tile = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else \
    rw3.W3_TILE
n = size * size
order, _ = lt.tile_ray_order(size, size, tile=tile)
cfg = _RenderCfg(
    num_samples=ns, num_samples_inf=0, gain=1.0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, inject_noise_sigma=0.0,
    grid_sizes=((1, res, res, res, chn),),
    color_grid_sizes=None, n_hidden_trunk=(chn, 32, 32),
    n_hidden_opacity=(32, 32, 1), n_hidden_color=(32, 32, 16),
    use_scaffold=False, scaffold_size=None, num_rays_noise=n,
)
pair = rw3.w3_geos(cfg, 32, None)
geos = list(pair[0]) + list(pair[1])
K = rp._march_chunk(cfg)
B = rp._ray_block(cfg)
print(f"tile={tile} B={B} K={K} budgets Z{rw3.W3_Z} Y{rw3.W3_Y} "
      f"WX{geos[0].WX}", flush=True)

fit_j = jax.jit(lambda o, d, nr, fr: rw3.w3_plan(
    cfg, o, d, nr, fr, K, False, geos, B,
    gsel=jnp.zeros((o.shape[0],), jnp.int32),
)[1])

ok = 0
tot = 0
for elev in (-40.0, -15.0, 10.0, 35.0, 60.0):
    cams = sphere_cameras(24, radius=2.5, elevation_deg=elev)
    for c2w in cams:
        o, d = camera_rays(c2w, size, size, size * 1.1, 1.0, 4.0)
        o = jnp.asarray(o)[order]
        d = jnp.asarray(d)[order]
        f = bool(fit_j(o, d, jnp.full((n,), 1.0), jnp.full((n,), 4.0)))
        ok += int(f)
        tot += 1
print(f"fit: {ok}/{tot} poses", flush=True)
