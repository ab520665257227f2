"""Decompose the sorted-splatter fw/bw time at the 16-view reference config.

axon-tunnel-safe timing: block_until_ready no-ops, so each phase is timed
by chaining iterations through a tiny data dependency (out*1e-30 folded
into an input) and doing ONE D2H at the end, subtracting the 1-iter run
(bench.py pattern).
"""

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

N_ITER = 8


def chain_time(label, step, d2h):
    """step(i) must consume the previous output via a data dependency;
    d2h(last_out) forces completion."""
    out = step(None)  # compile + warmup
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
    print(f"{label:10s} {dt*1e3:8.2f} ms")
    return dt


def main():
    n_views = int(os.environ.get("VIEWS", "16"))
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
    print(f"R={R} S={S} n_chunks={n_chunks} chunk_r={chunk_r} "
          f"geo SUP={geo.SUP} n_keys={geo.n_keys}")
    valid = jnp.ones((R,), jnp.float32)
    geom_full = (rays.directions, rays.origins, rays.near, rays.far,
                 rays.grid_idx.astype(jnp.int32), valid)
    Rp = n_chunks * chunk_r
    geom_c = tuple(_pad_rows(a, Rp)[:chunk_r] for a in geom_full)
    feat_c = _pad_rows(rays.encoding, Rp)[:chunk_r]

    N = chunk_r * S
    nbc, ngc = ss._caps(geo, N)
    Npad = ngc * ss.GBINS * ss.BIN
    print(f"chunk N={N} n_bins_cap={nbc} n_groups_cap={ngc} Npad={Npad} "
          f"(pad x{Npad/N:.2f})")

    plan_j = jax.jit(lambda g: ss.sorted_plan(cfg, g))

    def plan_step(prev):
        g = geom_c
        if prev is not None:
            eps = prev["fzT"][0, 0] * 1e-30
            g = (g[0] + eps,) + g[1:]
        return plan_j(g)

    chain_time("plan", plan_step, lambda p: np.asarray(p["table"][:1, :1]))

    plan = plan_j(geom_c)

    # --- isolate the main 5-stream sort ---
    key_h = jnp.asarray(
        np.random.default_rng(0).integers(0, geo.n_keys, N, dtype=np.int32))
    f1 = jnp.asarray(np.random.default_rng(1).random(N, dtype=np.float32))
    idx = jnp.arange(N, dtype=jnp.int32)
    sort5_j = jax.jit(lambda k, a, b, c, i: jax.lax.sort(
        (k, a, b, c, i), num_keys=1, is_stable=True))
    sort2_j = jax.jit(lambda k, i: jax.lax.sort(
        (k, i), num_keys=1, is_stable=True))

    def sort5_step(prev):
        k = key_h if prev is None else key_h + prev[4][0] * 0
        return sort5_j(k, f1, f1, f1, idx)

    chain_time("sort5", sort5_step, lambda o: np.asarray(o[0][:1]))

    def sort2_step(prev):
        k = key_h if prev is None else key_h + prev[1][0] * 0
        return sort2_j(k, idx)

    chain_time("sort2", sort2_step, lambda o: np.asarray(o[0][:1]))

    scat_j = jax.jit(
        lambda k, v: jnp.zeros((N,), jnp.int32).at[k].set(
            v, mode="drop", unique_indices=True))
    perm = jnp.asarray(np.random.default_rng(2).permutation(N).astype(np.int32))

    def scat_step(prev):
        k = perm if prev is None else perm + prev[0] * 0
        return scat_j(k, idx)

    chain_time("inv-scat", scat_step, lambda o: np.asarray(o[:1]))

    take_j = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    arr2 = jnp.stack([f1, f1, f1], axis=1)
    src = jnp.asarray(np.random.default_rng(3).integers(
        0, N, Npad, dtype=np.int32))

    def take_step(prev):
        s = src if prev is None else src + (prev[0, 0] * 0).astype(jnp.int32)
        return take_j(arr2, s)

    chain_time("take3pad", take_step, lambda o: np.asarray(o[:1, :1]))

    # --- vals gather ---
    vals_j = jax.jit(lambda p, f, v: ss.sorted_vals(geo, p, f, v))

    def vals_step(prev):
        f = feat_c if prev is None else feat_c + prev[0, 0] * 1e-30
        return vals_j(plan, f, geom_c[5])

    chain_time("vals", vals_step, lambda o: np.asarray(o[:1, :1]))

    vals = vals_j(plan, feat_c, geom_c[5])

    kfw_j = jax.jit(lambda p, v, a: ss.sorted_splat_acc(cfg, p, v, a),
                    donate_argnums=(2,))

    def kfw_step(prev):
        if prev is None:
            prev = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
        return kfw_j(plan, vals, prev)

    chain_time("kfw", kfw_step, lambda a: np.asarray(a[:1, :1, :1, :1]))

    gg0 = jnp.full((geo.PZ, geo.PY, geo.PXp, ss.CPAD), 0.1, jnp.float32)
    kbw_j = jax.jit(lambda p, g: ss.sorted_splat_bwd(cfg, p, chunk_r, g))

    def kbw_step(prev):
        g = gg0 if prev is None else gg0 + prev[0, 0] * 1e-30
        return kbw_j(plan, g)

    chain_time("kbw", kbw_step, lambda o: np.asarray(o[:1, :1]))


if __name__ == "__main__":
    main()
