"""Candidate W3 budget x 120-orbit-pose fit-rate sweep — CPU-runnable.

The W3 window plan's fit flag is pure host-side math (renderer_w3.w3_plan),
identical on CPU and TPU, so the fit half of the budget frontier can be
mapped WITHOUT the chip; only the rays/s half needs hardware.  Prints, for
each candidate (Z, Y, WX): fw/bw fit counts over the 120 orbit poses of
the big-voxel bench config, plus the zy*wxC matmul volume (the dominant
per-chunk MXU cost — the speed proxy).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from lightplane_tpu.ops.kernels import renderer_w3 as rw3
from lightplane_tpu.ops.renderer import _RenderCfg
from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras

size, res, chn, ns = 256, 64, 32, 256
tile = rw3.W3_TILE
n = size * size
order, _ = lt.tile_ray_order(size, size, tile=tile)

# pose set (matches scratch/probe_w3_fit.py)
poses = []
for elev in (-40.0, -15.0, 10.0, 35.0, 60.0):
    for c2w in sphere_cameras(24, radius=2.5, elevation_deg=elev):
        o, d = camera_rays(c2w, size, size, size * 1.1, 1.0, 4.0)
        poses.append((jnp.asarray(o)[order], jnp.asarray(d)[order]))
near = jnp.full((n,), 1.0)
far = jnp.full((n,), 4.0)

CANDS = [
    (12, 16, 12), (12, 16, 16), (16, 16, 12), (12, 24, 12),
    (16, 16, 16), (16, 24, 12), (12, 24, 16), (16, 24, 16),
    (16, 32, 16), (24, 24, 16), (16, 24, 24), (24, 32, 24),
]

print("budget(Z,Y,WX)  zy*wxC  fw_fit  bw_fit  (120 poses)", flush=True)
for budget in sorted(CANDS, key=lambda b: b[0] * b[1] * b[2]):
    cfg = _RenderCfg(
        num_samples=ns, num_samples_inf=0, gain=1.0,
        mask_out_of_bounds_samples=False, contract_coords=False,
        disparity_at_inf=1e-5, inject_noise_sigma=0.0,
        grid_sizes=((1, res, res, res, chn),),
        color_grid_sizes=None, n_hidden_trunk=(chn, 32, 32),
        n_hidden_opacity=(32, 32, 1), n_hidden_color=(32, 32, 16),
        use_scaffold=False, scaffold_size=None, num_rays_noise=n,
        w3_budget=budget,
    )
    pair = rw3.w3_geos(cfg, 32, None)
    if pair is None:
        print(f"{budget}  INFEASIBLE", flush=True)
        continue
    geos = list(pair[0]) + list(pair[1])
    B = rp._ray_block(cfg)
    g = geos[0]
    vol = g.zy * g.WX * g.C

    counts = {}
    for bw in (False, True):
        K = rp._march_chunk(cfg, bw=bw)
        fit_j = jax.jit(lambda o, d: rw3.w3_plan(
            cfg, o, d, near, far, K, bw, geos, B,
            gsel=jnp.zeros((n,), jnp.int32),
        )[1])
        counts[bw] = sum(int(bool(fit_j(o, d))) for o, d in poses)
    print(f"{budget}  {vol:7d}  {counts[False]:3d}/120  "
          f"{counts[True]:3d}/120", flush=True)
