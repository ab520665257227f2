"""Reconcile isolated phase times with the fused chunk body and full fw."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import splatter_sorted as ss
from lightplane_tpu.ops.splatter import (
    _SplatCfg, _sorted_chunk_shape, _pad_rows, _sorted_fwd_impl,
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
    valid = jnp.ones((R,), jnp.float32)
    geom_full = (rays.directions, rays.origins, rays.near, rays.far,
                 rays.grid_idx.astype(jnp.int32), valid)
    Rp = n_chunks * chunk_r
    geom_c = tuple(_pad_rows(a, Rp)[:chunk_r] for a in geom_full)
    feat_c = _pad_rows(rays.encoding, Rp)[:chunk_r]

    # fused single-chunk body: plan + vals + kernel, acc threaded/donated
    def body(geom_c, feat_c, acc):
        plan = ss.sorted_plan(cfg, geom_c)
        vals = ss.sorted_vals(geo, plan, feat_c, geom_c[5])
        return ss.sorted_splat_acc(cfg, plan, vals, acc)

    body_j = jax.jit(body, donate_argnums=(2,))

    def body_step(prev):
        if prev is None:
            prev = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
        return body_j(geom_c, feat_c, prev)

    chain_time("chunk body", body_step, lambda a: np.asarray(a[:1, :1, :1, :1]))

    # full fw (6 chunks via production path)
    full_j = jax.jit(lambda g, f: _sorted_fwd_impl(
        cfg, g, (f, None, None)))

    def full_step(prev):
        f = rays.encoding
        if prev is not None:
            f = f + prev[0][0, 0] * 1e-30
        return full_j(geom_full, f)

    chain_time("full fw 6ch", full_step, lambda o: np.asarray(o[0][:1, :1]))


if __name__ == "__main__":
    main()
