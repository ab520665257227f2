"""End-to-end W3 big-voxel renderer on the chip: BASELINE config #2
(voxel 64^3 x 32ch, 256^2 rays, 256 samples, fused MLPs).  Checks the
window-plan fit, parity vs scan on a subset, and fw/fwbw timing."""
import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import lightplane_tpu as lt
from tests.utils import random_decoder_params
from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from lightplane_tpu.ops.kernels import renderer_w3 as rw3

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=256)
p.add_argument("--res", type=int, default=64)
p.add_argument("--chn", type=int, default=32)
p.add_argument("--ns", type=int, default=256)
p.add_argument("--azim", type=float, default=35.0)
p.add_argument("--near", type=float, default=1.0)
p.add_argument("--far", type=float, default=4.0)
p.add_argument("--parity", action="store_true")
args = p.parse_args()

size = args.size
n = size * size
n_az = max(1, int(round(args.azim)))
cams = sphere_cameras(max(8, n_az + 1), radius=2.5, elevation_deg=25.0)
o, d = camera_rays(cams[n_az % len(cams)], size, size, size * 1.1,
                   args.near, args.far)
order, inv = lt.tile_ray_order(size, size, tile=(8, 8))
o, d = o[order], d[order]
rays = lt.Rays(
    directions=jnp.asarray(d), origins=jnp.asarray(o),
    grid_idx=jnp.zeros((n,), jnp.int32),
    near=jnp.full((n,), args.near), far=jnp.full((n,), args.far),
    encoding=jax.random.normal(jax.random.PRNGKey(0), (n, 32)) * 0.1,
)
grid = [jax.random.normal(jax.random.PRNGKey(1),
                          (1, args.res, args.res, args.res, args.chn)) * 0.3]
dp = random_decoder_params(jax.random.PRNGKey(2), input_chn=args.chn,
                           hidden_chn=32, color_chn=3)

# --- check the window plan fit directly ---
from lightplane_tpu.ops.renderer import _RenderCfg
cfg = _RenderCfg(
    num_samples=args.ns, num_samples_inf=0, gain=1.0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, inject_noise_sigma=0.0,
    grid_sizes=((1, args.res, args.res, args.res, args.chn),),
    color_grid_sizes=None, n_hidden_trunk=(args.chn, 32, 32),
    n_hidden_opacity=(32, 32, 1), n_hidden_color=(32, 32, 16),
    use_scaffold=False, scaffold_size=None, num_rays_noise=n,
)
pair = rw3.w3_geos(cfg, 32, None)
print("geos:", pair)
K = rp._march_chunk(cfg)
B = rp._ray_block(cfg)
arrs, _, _, _ = rp._ray_inputs(
    cfg, (rays.directions, rays.origins, rays.near, rays.far,
          rays.grid_idx, None, 0), rays.encoding, B)
w0, fits = jax.jit(
    lambda o_, d_, nr, fr: rw3.w3_plan(cfg, o_, d_, nr, fr, K,
                                       False, [pair[0]], B)
)(arrs[0], arrs[1], arrs[2][:, 0], arrs[3][:, 0])
print(f"fw plan fits: {bool(fits)}   (B={B}, K={K})")

def run(impl, enc):
    r = dataclasses.replace(rays, encoding=enc)
    return lt.lightplane_renderer(r, grid, dp, num_samples=args.ns,
                                  gain=1.0, impl=impl)

def loss(impl, g, mp, enc):
    r = dataclasses.replace(rays, encoding=enc)
    dpp = dataclasses.replace(dp, mlp_params=mp)
    out = lt.lightplane_renderer(r, g, dpp, num_samples=args.ns, gain=1.0,
                                 impl=impl)
    return sum(jnp.sum(x) for x in out)

if args.parity:
    out_p = jax.jit(lambda e: run("pallas", e))(rays.encoding)
    out_s = jax.jit(lambda e: run("scan", e))(rays.encoding)
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        aa, bb = np.asarray(a), np.asarray(b)
        rel = np.abs(aa - bb).max() / (np.abs(aa).max() + 1e-9)
        print(f"fw {nm}: max rel {rel:.2e}")

f_fw = jax.jit(lambda e: run("pallas", e)).lower(rays.encoding).compile()
f_bw = (jax.jit(jax.grad(lambda g, mp, e: loss("pallas", g, mp, e),
                         argnums=(0, 1, 2)))
        .lower(grid, dp.mlp_params, rays.encoding).compile())
ma = f_bw.memory_analysis()
print(f"bw temp {ma.temp_size_in_bytes/2**30:.2f} GiB")

for nm, fn, fa in [("fw", f_fw, (rays.encoding,)),
                   ("fwbw", f_bw, (grid, dp.mlp_params, rays.encoding))]:
    out = fn(*fa)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*fa)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{nm}: {dt*1e3:.1f} ms   {n/dt:,.0f} rays/s")
