"""Round-3 sorted-splatter profile at the reference bench config.

Times, separately: phase A (sorted_plan), value gather (sorted_vals),
phase B (splat kernel), full fw, full fwbw, bw-only pieces — to find the
2x the VERDICT asks for.  Run ON CHIP (axon default backend), alone.
"""
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import splatter_sorted as ss
from lightplane_tpu.ops.splatter import (
    _SplatCfg, _sorted_chunk_shape, _pad_rows,
)
from benchmarks.splatter_speed import make_rays

VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
GRID = 160
CHN = 64
NS = 96

rays = make_rays(jax.random.PRNGKey(0), VIEWS, 128, CHN)
R = rays.directions.shape[0]
sizes = ((1, GRID, GRID, GRID, CHN),)
cfg = _SplatCfg(
    num_samples=NS, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, output_grid_sizes=sizes,
    input_grid_sizes=None, n_hidden=(),
)
(geo,) = ss.sorted_geos(cfg)
n_chunks, chunk_r = _sorted_chunk_shape(R, NS)
print(f"R={R} chunks={n_chunks} chunk_r={chunk_r} geo SUP=({geo.SUPZ},"
      f"{geo.SUPY}) n_keys={geo.n_keys}")

valid = jnp.ones((R,), jnp.float32)
geom = (rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), valid)
geom_c = tuple(_pad_rows(a, n_chunks * chunk_r)[:chunk_r] for a in geom)
enc_c = _pad_rows(rays.encoding, n_chunks * chunk_r)[:chunk_r]


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain via a dummy dependency to defeat async dispatch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")
    return dt


plan_f = jax.jit(lambda g: ss.sorted_plan(cfg, geo, g))
plan = plan_f(geom_c)
t_plan = timeit("plan (1 chunk)", plan_f, geom_c)

vals_f = jax.jit(lambda p, e, v: ss.sorted_vals(geo, p, e, v))
vals = vals_f(plan, enc_c, geom_c[5])
t_vals = timeit("vals gather (1 chunk)", vals_f, plan, enc_c, geom_c[5])

acc0 = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
kern_f = jax.jit(lambda p, v, a: ss.sorted_splat_acc(cfg, geo, p, v, a))
acc = kern_f(plan, vals, acc0)
t_kern = timeit("splat kernel (1 chunk)", kern_f, plan, vals, acc0)

gg = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
bw_f = jax.jit(lambda p, g: ss.sorted_splat_bwd(cfg, geo, p, chunk_r, g))
_ = bw_f(plan, gg)
t_bw = timeit("bw gather+unsort (1 chunk)", bw_f, plan, gg)

print(f"per-chunk total fw ~= {1e3*(t_plan+t_vals+t_kern):.1f} ms x "
      f"{n_chunks} chunks")


def full_fw(enc):
    import dataclasses
    r = dataclasses.replace(rays, encoding=enc)
    return lt.lightplane_splatter(
        r, list(sizes), num_samples=NS, return_list=False, impl="sorted")


f_fw = jax.jit(full_fw)
_ = f_fw(rays.encoding)
t_fw = timeit("full fw", f_fw, rays.encoding)

f_bwd = jax.jit(jax.grad(lambda e: jnp.sum(full_fw(e) ** 2)))
_ = f_bwd(rays.encoding)
t_fwbw = timeit("full fwbw", f_bwd, rays.encoding)
n = R
print(f"rays/s: fw {n/t_fw:.0f}  fwbw {n/t_fwbw:.0f}")
