"""Decompose the e2e fwbw: fw impl (with/without plan residuals), bwd
impl with saved plans, and the full grad.  Amortized dispatch.
Run alone on chip: python scratch/prof_splat13.py
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops import splatter as sp
from benchmarks.splatter_speed import make_rays

GRID, CHN, NS, VIEWS = 160, 64, 96, 16
rays = make_rays(jax.random.PRNGKey(0), VIEWS, 128, CHN)
R = rays.directions.shape[0]
sizes = [(1, GRID, GRID, GRID, CHN)]
cfg = sp._SplatCfg(
    num_samples=NS, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, output_grid_sizes=tuple(
        tuple(s) for s in sizes),
    input_grid_sizes=None, n_hidden=(),
)
valid = jnp.ones((R,), jnp.float32)
geom = (rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), valid)
diff = (rays.encoding, None, None)


def bench(name, fn, n=5):
    fn()
    def run(k):
        for _ in range(k):
            o = fn()
        return o
    o = run(1); np.asarray(jnp.ravel(o)[:1])
    t0 = time.perf_counter()
    o = run(1); np.asarray(jnp.ravel(o)[:1])
    t1 = time.perf_counter()
    o = run(n); np.asarray(jnp.ravel(o)[:1])
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n - 1)
    print(f"{name}: {dt*1e3:.0f} ms", flush=True)


out_plans = jax.jit(
    lambda: sp._sorted_fwd_impl(cfg, geom, diff, want_plans=True)
)()
(_, plans) = out_plans
plans = jax.tree_util.tree_map(jax.device_put, plans)
gflat = jnp.ones((GRID ** 3, CHN), jnp.float32) * 0.1

bw = jax.jit(lambda g, p: sp._sorted_bwd_impl(cfg, geom, g, plans=p))
bench("bwd impl (saved plans)", lambda: bw(gflat, plans))

bw_re = jax.jit(lambda g: sp._sorted_bwd_impl(cfg, geom, g, plans=None))
bench("bwd impl (recompute plans)", lambda: bw_re(gflat))


def loss(enc):
    r = dataclasses.replace(rays, encoding=enc)
    return jnp.sum(lt.lightplane_splatter(
        r, sizes, num_samples=NS, return_list=False, impl="sorted") ** 2)


g_f = jax.jit(jax.grad(loss))
bench("full grad(loss)", lambda: g_f(rays.encoding))
fw_f = jax.jit(loss)
bench("full loss (primal only)", lambda: fw_f(rays.encoding))


def loss_raw(enc):
    r = dataclasses.replace(rays, encoding=enc)
    f, w = sp.lightplane_splatter_raw(
        r, sizes, num_samples=NS, impl="sorted")
    return jnp.sum(f ** 2) + jnp.sum(w ** 2)


if "--raw" in sys.argv:
    g_r = jax.jit(jax.grad(loss_raw))
    bench("grad(loss_raw: no normalize)", lambda: g_r(rays.encoding))
