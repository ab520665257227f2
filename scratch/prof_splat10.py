"""E2e-faithful fw stage timing: full plan jit, fw kernel with donated
accumulator, and the composed plan+kernel chunk body.
Run alone on chip: python scratch/prof_splat10.py
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu.ops.kernels import splatter_sorted as ss
from lightplane_tpu.ops.splatter import _SplatCfg, _sorted_chunk_shape
from benchmarks.splatter_speed import make_rays

GRID, CHN, NS, VIEWS = 160, 64, 96, 16
rays = make_rays(jax.random.PRNGKey(0), VIEWS, 128, CHN)
R = rays.directions.shape[0]
cfg = _SplatCfg(
    num_samples=NS, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5,
    output_grid_sizes=((1, GRID, GRID, GRID, CHN),),
    input_grid_sizes=None, n_hidden=(),
)
(geo,) = ss.sorted_geos(cfg)
n_chunks, chunk_r = _sorted_chunk_shape(R, NS)
valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)
feat_aug = ss.feat_augmented(rays.encoding[:chunk_r], valid)
print(f"chunk_r={chunk_r} chunks={n_chunks} CPAD={geo.CPAD}", flush=True)


def bench(name, fn, n=6):
    fn()  # compile+warm
    fn()
    t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
    for _ in range(n):
        fn()
    t2 = time.perf_counter()
    dt = ((t2 - t1) * 1 if False else (t2 - t1) - 0) / n
    # subtract single-run overhead estimate: use (t1-t0) as 1-run cost
    dt = ((t2 - t1) - 0) / n
    print(f"{name}: {dt*1e3:.1f} ms  (single {((t1-t0))*1e3:.1f})",
          flush=True)


# 1. full plan (want_pos, feat) — consume tiny slices only
plan_j = jax.jit(
    lambda *g: ss.sorted_plan(cfg, geo, g[:-1], want_pos=True,
                              feat_aug=g[-1])
)
def run_plan():
    p = plan_j(*(geom_c + (feat_aug,)))
    np.asarray(p["fzT"][:1, :1])

bench("full plan+vals (want_pos)", run_plan)

# 1b. plan without pos
plan_np = jax.jit(
    lambda *g: ss.sorted_plan(cfg, geo, g[:-1], want_pos=False,
                              feat_aug=g[-1])
)
def run_plan_np():
    p = plan_np(*(geom_c + (feat_aug,)))
    np.asarray(p["fzT"][:1, :1])

bench("plan+vals (no pos)", run_plan_np)

# 2. fw kernel with donated acc, real plan
plan = plan_j(*(geom_c + (feat_aug,)))
plan = {k: jax.device_put(v) for k, v in plan.items()}
vals = plan.pop("vals")
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32)
fwk = jax.jit(
    lambda a, v: ss.sorted_splat_acc(cfg, geo, plan, v, a),
    donate_argnums=0,
)
state = {"a": fwk(acc0, vals)}
jax.block_until_ready(state["a"])

def run_fwk():
    state["a"] = fwk(state["a"], vals)
    np.asarray(state["a"][:1, :1, :1])

bench("fw kernel (donated acc)", run_fwk)

# 3. composed chunk body: plan + vals + kernel (donated acc)
def chunk_body(a, d, o, nr, fr, gi, v, fa):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=True,
                       feat_aug=fa)
    vv = p.pop("vals")
    return ss.sorted_splat_acc(cfg, geo, p, vv, a)

body_j = jax.jit(chunk_body, donate_argnums=0)
state2 = {"a": body_j(jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32),
                      *(geom_c + (feat_aug,)))}
jax.block_until_ready(state2["a"])

def run_body():
    state2["a"] = body_j(state2["a"], *(geom_c + (feat_aug,)))
    np.asarray(state2["a"][:1, :1, :1])

bench("chunk body plan+kernel", run_body)
