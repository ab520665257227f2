"""A/B the old (round-3) vs new (round-4) sorted-splat fw, decomposed as
6-chunk scans with amortized dispatch: plan-only scan, kernel-only scan.
Run alone on chip: python scratch/prof_splat12.py
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import jax
import jax.numpy as jnp
import numpy as np

import old_ss
from lightplane_tpu.ops.kernels import splatter_sorted as new_ss
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
n_chunks, chunk_r = _sorted_chunk_shape(R, NS)
Rp = n_chunks * chunk_r


def stack(a):
    pad = jnp.pad(a, ((0, Rp - R),) + ((0, 0),) * (a.ndim - 1))
    return pad.reshape((n_chunks, chunk_r) + a.shape[1:])


valid = jnp.concatenate(
    [jnp.ones((R,), jnp.float32), jnp.zeros((Rp - R,), jnp.float32)]
)
geom_s = (stack(rays.directions), stack(rays.origins), stack(rays.near),
          stack(rays.far), stack(rays.grid_idx.astype(jnp.int32)),
          valid.reshape(n_chunks, chunk_r))
enc_s = stack(rays.encoding)


def bench(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out) if out is not None else None

    def run(k):
        for _ in range(k):
            o = fn()
        return o

    o = run(1)
    np.asarray(jnp.ravel(o)[:1])
    t0 = time.perf_counter()
    o = run(1); np.asarray(jnp.ravel(o)[:1])
    t1 = time.perf_counter()
    o = run(n); np.asarray(jnp.ravel(o)[:1])
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n - 1) if n > 1 else (t2 - t1)
    print(f"{name}: {dt*1e3:.0f} ms total ({dt/n_chunks*1e3:.1f}/chunk)",
          flush=True)


# ---- plan-only scans ----
def mk_plan_scan(ss, with_vals):
    def body(c, xs):
        geom_c = xs[:6]
        p = (
            ss.sorted_plan(cfg, geo_of[ss], geom_c, want_pos=True,
                           feat_aug=ss.feat_augmented(xs[6], geom_c[5]))
            if with_vals == "new"
            else ss.sorted_plan(cfg, geo_of[ss], geom_c, want_pos=True)
        )
        if with_vals == "old":
            v = ss.sorted_vals(geo_of[ss], p, xs[6], geom_c[5])
            return c + jnp.sum(v[:1]), p["fzT"][0, 0]
        if with_vals == "new":
            return c + p["vals"][0, 0], p["fzT"][0, 0]
        return c, p["fzT"][0, 0]

    @jax.jit
    def f():
        c, ys = jax.lax.scan(body, 0.0, geom_s + (enc_s,))
        return c + jnp.sum(ys)

    return f


geo_of = {
    old_ss: old_ss.sorted_geos(cfg)[0],
    new_ss: new_ss.sorted_geos(cfg)[0],
}

if "--plans" in sys.argv:
    bench("OLD plan+vals scan x6", mk_plan_scan(old_ss, "old"))
    bench("NEW plan+vals scan x6", mk_plan_scan(new_ss, "new"))


# ---- kernel-only scans (fixed plan, threaded acc) ----
def mk_kernel_scan(ss, acc_shape):
    geo = geo_of[ss]
    plan = jax.jit(
        lambda *g: ss.sorted_plan(cfg, geo, g, want_pos=False)
    )(*(tuple(a[0] for a in geom_s)))
    if ss is new_ss:
        plan2 = jax.jit(
            lambda *g: new_ss.sorted_plan(
                cfg, geo, g[:-1], want_pos=False, feat_aug=g[-1])
        )(*(tuple(a[0] for a in geom_s) + (enc_s[0],)))
        vals = plan2.pop("vals")
        plan = {k: v for k, v in plan2.items() if k != "pos_orig"}
    else:
        vals = jax.jit(
            lambda e: ss.sorted_vals(geo, plan, e, geom_s[5][0])
        )(enc_s[0])
        plan = {k: v for k, v in plan.items() if k != "pos_orig"}
    plan = {k: jax.device_put(v) for k, v in plan.items()}

    @jax.jit
    def g(plan, vals):
        def body(acc, _):
            return ss.sorted_splat_acc(cfg, geo, plan, vals, acc), 0
        acc0 = jnp.zeros(acc_shape, jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
        return acc[0, 0, :1]

    return lambda: g(plan, vals)


go, gn = geo_of[old_ss], geo_of[new_ss]
if "--fw" in sys.argv:
    bench("OLD kernel scan x6",
          mk_kernel_scan(old_ss, (go.PZ, go.PY, go.PXp, old_ss.CPAD)))
    bench("NEW kernel scan x6",
          mk_kernel_scan(new_ss, (gn.PZ, gn.PY, gn.LX)))


# ---- bw kernel scans ----
def mk_bw_scan(ss):
    geo = geo_of[ss]
    plan = jax.jit(
        lambda *g: ss.sorted_plan(cfg, geo, g, want_pos=True)
    )(*(tuple(a[0] for a in geom_s)))
    plan = {k: jax.device_put(v) for k, v in plan.items()
            if k not in ("vals",)}
    if ss is old_ss:
        gg = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
    else:
        gg = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32)

    @jax.jit
    def g(plan, gg):
        def body(c, _):
            t = ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, gg)
            return c + jnp.sum(t), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(n_chunks))
        return c

    return lambda: g(plan, gg)


if "--bw" in sys.argv:
    bench("OLD bw scan x6 (kernel+unsort+sum)", mk_bw_scan(old_ss))
    bench("NEW bw scan x6 (kernel+unsort+sum)", mk_bw_scan(new_ss))
