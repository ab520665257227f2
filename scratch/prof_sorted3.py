"""Split the sorted-splat chunk body: plan vs vals vs fw kernel vs bw."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu.ops.kernels import splatter_sorted as ss
from lightplane_tpu.ops.splatter import (
    _SplatCfg, _sorted_chunk_shape, _pad_rows,
)
from benchmarks.splatter_speed import make_rays

N_ITER = 5


def chain_time(label, step, d2h):
    out = step(None)
    d2h(out)
    t0 = time.perf_counter()
    d2h(step(None))
    t1 = time.perf_counter()
    out = None
    for _ in range(N_ITER + 1):
        out = step(out)
    d2h(out)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / N_ITER
    print(f"{label:16s} {dt*1e3:8.2f} ms")
    return dt


def main():
    n_views = 16
    grid_res, chn, num_samples = 160, 64, 96
    rays = make_rays(jax.random.PRNGKey(0), n_views, 128, chn)
    sizes = ((1, grid_res, grid_res, grid_res, chn),)
    cfg = _SplatCfg(
        num_samples=num_samples, num_samples_inf=0,
        mask_out_of_bounds_samples=False, contract_coords=False,
        disparity_at_inf=1e-5, output_grid_sizes=sizes,
        input_grid_sizes=None, n_hidden=(),
    )
    geo = ss.sorted_geo(cfg)
    R = rays.directions.shape[0]
    S = cfg.tot_num_samples
    n_chunks, chunk_r = _sorted_chunk_shape(R, S)
    print(f"chunks={n_chunks} chunk_r={chunk_r} geo={geo}")
    valid = jnp.ones((R,), jnp.float32)
    geom_full = (rays.directions, rays.origins, rays.near, rays.far,
                 rays.grid_idx.astype(jnp.int32), valid)
    Rp = n_chunks * chunk_r
    geom_c = tuple(_pad_rows(a, Rp)[:chunk_r] for a in geom_full)
    feat_c = _pad_rows(rays.encoding, Rp)[:chunk_r]

    plan_j = jax.jit(lambda g: ss.sorted_plan(cfg, g))

    def plan_step(prev):
        g = geom_c
        if prev is not None:
            g = (g[0] + prev["fzT"][0, 0] * 1e-30,) + g[1:]
        return plan_j(g)

    chain_time("plan", plan_step, lambda p: np.asarray(p["table"][:1, :1]))

    plan0 = jax.jit(lambda g: ss.sorted_plan(cfg, g))(geom_c)
    vals_j = jax.jit(lambda p, f: ss.sorted_vals(geo, p, f, geom_c[5]))

    def vals_step(prev):
        f = feat_c
        if prev is not None:
            f = f + prev[0, 0] * 1e-30
        return vals_j(plan0, f)

    chain_time("vals", vals_step, lambda v: np.asarray(v[:1, :1]))

    vals0 = vals_j(plan0, feat_c)
    kern_j = jax.jit(
        lambda p, v, a: ss.sorted_splat_acc(cfg, p, v, a),
        donate_argnums=(2,),
    )

    def kern_step(prev):
        if prev is None:
            prev = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD),
                             jnp.float32)
        return kern_j(plan0, vals0, prev)

    chain_time("fw kernel", kern_step,
               lambda a: np.asarray(a[:1, :1, :1, :1]))

    gg0 = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
    bw_j = jax.jit(
        lambda p, g: ss.sorted_splat_bwd(cfg, p, chunk_r, g)
    )

    def bw_step(prev):
        g = gg0
        if prev is not None:
            g = g + prev[0, 0] * 1e-30
        return bw_j(plan0, g)

    chain_time("bw kernel+unsort", bw_step, lambda o: np.asarray(o[:1, :1]))


if __name__ == "__main__":
    main()
