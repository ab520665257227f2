"""Per-phase timings of the gen-2 sorted splatter (round-4 API).
Run alone on chip: python scratch/prof_splat8.py [views]
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

VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
GRID, CHN, NS = 160, 64, 96

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
print(f"chunk_r={chunk_r} chunks={n_chunks} CPAD={geo.CPAD} "
      f"acc={geo.acc_bytes/2**30:.2f}GiB", flush=True)

valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)
enc_c = rays.encoding[:chunk_r]
feat_aug = ss.feat_augmented(enc_c, valid)


def timeit(name, f, args):
    out = f(*args)
    jax.block_until_ready(out)

    def chain(n):
        a = args
        for _ in range(n):
            o = f(*a)
            a = (a[0] + o * 1e-30,) + a[1:]
        return np.asarray(o)

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(4); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 3
    print(f"{name}: {dt*1e3:.1f} ms/chunk (x{n_chunks} = "
          f"{dt*n_chunks*1e3:.0f} ms)", flush=True)
    return dt


def plan_sum(p):
    s = (jnp.sum(p["fzT"]) + jnp.sum(p["table"]).astype(jnp.float32)
         + jnp.sum(p["sample_pad"]).astype(jnp.float32))
    if p.get("vals") is not None:
        s = s + jnp.sum(p["vals"][::1997])
    if p.get("pos_orig") is not None:
        s = s + jnp.sum(p["pos_orig"]).astype(jnp.float32)
    return s


@jax.jit
def plan_nopos(d, o, nr, fr, gi, v, fa):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=False,
                       feat_aug=fa)
    return plan_sum(p)


@jax.jit
def plan_pos(d, o, nr, fr, gi, v, fa):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=True,
                       feat_aug=fa)
    return plan_sum(p)


timeit("plan+vals want_pos=False", plan_nopos, geom_c + (feat_aug,))
timeit("plan+vals want_pos=True ", plan_pos, geom_c + (feat_aug,))

plan = jax.jit(
    lambda *g: ss.sorted_plan(cfg, geo, g[:-1], want_pos=True,
                              feat_aug=g[-1])
)(*(geom_c + (feat_aug,)))
plan = {k: jax.device_put(v) for k, v in plan.items()}
vals = plan.pop("vals")
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32)


@jax.jit
def fw_kernel_only(v, acc):
    return jnp.sum(ss.sorted_splat_acc(cfg, geo, plan, v, acc)[:2])


timeit("fw kernel (sum[:2] rows)", fw_kernel_only, (vals, acc0))

gg = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32) + 0.1


@jax.jit
def bw_all(g):
    return jnp.sum(ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, g))


timeit("bw kernel+unsort+raysum", bw_all, (gg,))
