"""Sorted-splatter stage isolation, tunnel-safe.

Each stage is one jit with device-resident inputs; timing chains
iterations through a data dependency (add eps*scalar(output) into a
float input) with one D2H at the end, subtracting the 1-iter run.
Run alone on the chip: python scratch/prof_splat5.py [views]
"""
import sys, time

sys.path.insert(0, "/root/repo")

import dataclasses
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
N = chunk_r * NS
print(f"R={R} chunks={n_chunks} chunk_r={chunk_r} N/chunk={N} "
      f"n_keys={geo.n_keys} n_sup={geo.n_sup} SUP={geo.SUPZ}x{geo.SUPY} "
      f"PXp={geo.PXp}", flush=True)

valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)
enc_c = rays.encoding[:chunk_r]


def timeit(name, f, *args, per_chunk=True):
    """f(*args) -> (chained_input_update, scalar_probe)."""
    out = f(*args)
    jax.block_until_ready(out)

    def chain(n):
        a = args
        for _ in range(n):
            o = f(*a)
            a = (a[0] + o * 1e-30,) + a[1:]
        return np.asarray(o.ravel()[:1])

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(4); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 3
    tot = dt * (n_chunks if per_chunk else 1)
    print(f"{name}: {dt*1e3:.1f} ms/chunk  (x{n_chunks} = {tot*1e3:.0f} ms)",
          flush=True)
    return dt


# --- raw sorts -----------------------------------------------------------
key0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, geo.n_keys + 1,
                          dtype=jnp.int32)
idx0 = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def raw_sort1(keyf):
    k = keyf.astype(jnp.int32)
    ks = jax.lax.sort((k,), num_keys=1, is_stable=False)[0]
    return ks[:1].astype(jnp.float32)


@jax.jit
def raw_sort2(keyf):
    k = keyf.astype(jnp.int32)
    ks, is_ = jax.lax.sort((k, idx0), num_keys=1, is_stable=False)
    return (ks[:1] + is_[:1]).astype(jnp.float32)


keyf = key0.astype(jnp.float32)
timeit("raw 1-stream sort 4.2M", raw_sort1, keyf)
timeit("raw 2-stream sort 4.2M", raw_sort2, keyf)


# --- plan ----------------------------------------------------------------
@jax.jit
def plan_nopos(d, o, nr, fr, gi, v):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=False)
    return (p["fzT"].ravel()[:1] + p["table"].ravel()[:1]
            + p["ray_pad"].ravel()[:1]).astype(jnp.float32)


@jax.jit
def plan_pos(d, o, nr, fr, gi, v):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=True)
    return (p["fzT"].ravel()[:1] + p["table"].ravel()[:1]
            + p["ray_pad"].ravel()[:1]
            + p["pos_orig"].ravel()[:1]).astype(jnp.float32)


timeit("plan want_pos=False", plan_nopos, *geom_c)
timeit("plan want_pos=True ", plan_pos, *geom_c)

# --- kernel fw / vals / bw on a real plan --------------------------------
plan = jax.jit(
    lambda *g: ss.sorted_plan(cfg, geo, g, want_pos=True)
)(*geom_c)
plan = {k: jax.device_put(v) for k, v in plan.items()}
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)


@jax.jit
def vals_only(enc, rp):
    v = ss.sorted_vals(geo, {"ray_pad": rp}, enc, valid)
    return v.ravel()[:1]


timeit("vals gather", vals_only, enc_c, plan["ray_pad"])

vals = jax.jit(
    lambda e: ss.sorted_vals(geo, {"ray_pad": plan["ray_pad"]}, e, valid)
)(enc_c)


@jax.jit
def fw_kernel_only(v, acc):
    out = ss.sorted_splat_acc(cfg, geo, plan, v, acc)
    return out.ravel()[:1]


timeit("fw kernel", fw_kernel_only, vals, acc0)

gg = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32) + 0.1


@jax.jit
def bw_kernel_only(g):
    ge = ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, g)
    return ge.ravel()[:1]


timeit("bw kernel+unsort+raysum", bw_kernel_only, gg)
