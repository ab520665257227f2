"""Sorted-splatter PLAN piece timing: cumulative stages, sum-consumed
(ravel()[:1] lets XLA slice-propagate and DCE the work; jnp.sum forces
the full arrays).  Diffs between cumulative stages = per-piece cost.
Run alone on chip: python scratch/prof_splat6.py [views]
"""
import sys, time

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
N = chunk_r * NS
n_bins_cap, n_groups_cap = ss._caps(geo, N)
n_bins_pad = n_groups_cap * ss.GBINS
Npad = n_bins_pad * ss.BIN
print(f"chunk_r={chunk_r} N={N} Npad={Npad} ngc={n_groups_cap}", flush=True)

valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)


def stage(upto):
    """Rebuild sorted_plan up to a named stage, summing its outputs."""
    def f(d, o, nr, fr, gi, v):
        geom = (d, o, nr, fr, gi, v)
        directions, origins, near, far, grid_idx, valid_mask = geom
        Rc = d.shape[0]
        S = cfg.tot_num_samples
        lz_n, ly_n, lx_n = geo.lz_n, geo.ly_n, geo.n_loc_x

        step = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (Rc, S))
        pts = ss._march_points(
            cfg, origins[:, None, :], directions[:, None, :],
            near[:, None], far[:, None], step)
        fz, fy, fx = ss._kernel_coords(geo, pts, grid_idx[:, None])
        cz = jnp.clip(jnp.floor(fz), 0, geo.Dk - 1).astype(jnp.int32)
        cy = jnp.clip(jnp.floor(fy), 0, geo.Hk - 1).astype(jnp.int32)
        cx = jnp.clip(jnp.floor(fx), 0, geo.Wk - 1).astype(jnp.int32)
        sz, sy = cz // geo.SUPZ, cy // geo.SUPY
        lz = (cz // ss.OCT) % lz_n if geo.Dk > 1 else cz * 0
        ly = (cy // ss.OCT) % ly_n
        lx = cx // ss.OCT
        key = ((sz * geo.nsy + sy) * geo.n_loc
               + (lz * ly_n + ly) * lx_n + lx)
        dead = ~(valid_mask[:, None] > 0)
        live = ((fz > -1.0) & (fz < geo.Dk) & (fy > -1.0) & (fy < geo.Hk)
                & (fx > -1.0) & (fx < geo.Wk))
        dead = dead | ~live
        key = jnp.where(dead, geo.n_keys, key).reshape(N)
        if upto == "P1_keys":
            return jnp.sum(key)

        idx = jnp.arange(N, dtype=jnp.int32)
        key_s, idx_s = jax.lax.sort((key, idx), num_keys=1, is_stable=False)
        if upto == "P2_sort":
            return jnp.sum(key_s) + jnp.sum(idx_s)

        bounds = jnp.searchsorted(
            key_s, jnp.arange(geo.n_keys + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        counts = jnp.diff(bounds)
        nb = -(-counts // ss.BIN)
        nb_sup = nb.reshape(geo.n_sup, geo.n_loc)
        bins_sup = nb_sup.sum(axis=1)
        groups_sup = -(-bins_sup // ss.GBINS)
        gstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(groups_sup)]
        ).astype(jnp.int32)
        obo = jnp.cumsum(nb_sup, axis=1) - nb_sup
        octet_bin_start = (
            (gstart[:-1] * ss.GBINS)[:, None] + obo
        ).reshape(geo.n_keys).astype(jnp.int32)
        if upto == "P3_tables":
            return jnp.sum(octet_bin_start) + jnp.sum(key_s) + jnp.sum(idx_s)

        b = jnp.arange(n_bins_pad, dtype=jnp.int32)
        bin_oct = (
            jnp.searchsorted(octet_bin_start, b, side="right") - 1
        ).astype(jnp.int32)
        bin_oct = jnp.clip(bin_oct, 0, geo.n_keys - 1)
        rank0 = (b - jnp.take(octet_bin_start, bin_oct)) * ss.BIN
        src_base = jnp.take(bounds, bin_oct) + rank0
        cnt_b = jnp.take(counts, bin_oct)
        j = jnp.arange(ss.BIN, dtype=jnp.int32)[None]
        valid_slot = (rank0[:, None] + j) < cnt_b[:, None]
        src = jnp.where(valid_slot, src_base[:, None] + j, N).reshape(Npad)
        if upto == "P4_src":
            return jnp.sum(src) + jnp.sum(idx_s)

        idx_s_app = jnp.concatenate(
            [idx_s, jnp.full((1,), N, jnp.int32)])
        slot_sample = jnp.take(idx_s_app, src)
        if upto == "P5_slotgather":
            return jnp.sum(slot_sample)

        ray_pad = jnp.where(
            slot_sample >= N, Rc, jnp.minimum(slot_sample // S, Rc - 1))
        if upto == "P5b_raypad":
            return jnp.sum(slot_sample) + jnp.sum(ray_pad)

        def groupT(col):
            return (col.reshape(n_groups_cap, ss.GBINS, ss.BIN)
                    .transpose(0, 2, 1)
                    .reshape(n_groups_cap * ss.BIN, ss.GBINS))

        sampleT = groupT(slot_sample)
        if upto == "P6a_transpose":
            return jnp.sum(sampleT) + jnp.sum(ray_pad)

        rayT = jnp.minimum(sampleT // S, Rc)
        stepT = sampleT % S
        g9 = jnp.concatenate(
            [origins, directions, near[:, None], far[:, None],
             grid_idx[:, None].astype(jnp.float32)], axis=1,
        ).astype(jnp.float32)
        g9 = jnp.concatenate([g9, jnp.zeros((1, 9), jnp.float32)], axis=0)
        g9T = jnp.take(g9, rayT.reshape(-1), axis=0).reshape(
            rayT.shape + (9,))
        if upto == "P6b_g9gather":
            return jnp.sum(g9T) + jnp.sum(ray_pad)

        ptsT = ss._march_points(
            cfg, g9T[..., 0:3], g9T[..., 3:6], g9T[..., 6], g9T[..., 7],
            stepT)
        fzT, fyT, fxT = ss._kernel_coords(
            geo, ptsT, g9T[..., 8].astype(jnp.int32))
        pad_slot = sampleT == N
        fzT = jnp.where(pad_slot, ss._BIG, fzT)
        fyT = jnp.where(pad_slot, ss._BIG, fyT)
        fxT = jnp.where(pad_slot, ss._BIG, fxT)
        if upto == "P6c_coords":
            return (jnp.sum(fzT) + jnp.sum(fyT) + jnp.sum(fxT)
                    + jnp.sum(ray_pad))

        rank = idx - jnp.take(bounds, jnp.minimum(key_s, geo.n_keys))
        pos = (jnp.take(octet_bin_start,
                        jnp.minimum(key_s, geo.n_keys - 1))
               + rank // ss.BIN) * ss.BIN + rank % ss.BIN
        pos = jnp.where(key_s == geo.n_keys, Npad, pos)
        _, pos_orig = jax.lax.sort((idx_s, pos), num_keys=1, is_stable=False)
        return (jnp.sum(fzT) + jnp.sum(fyT) + jnp.sum(fxT)
                + jnp.sum(ray_pad) + jnp.sum(pos_orig))
    return jax.jit(f)


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
    print(f"{name}: {dt*1e3:.1f} ms/chunk", flush=True)
    return dt


prev = 0.0
for name in ["P1_keys", "P2_sort", "P3_tables", "P4_src", "P5_slotgather",
             "P5b_raypad", "P6a_transpose", "P6b_g9gather", "P6c_coords",
             "P7_pos"]:
    dt = timeit(name, stage(name), geom_c)
    print(f"   delta: {(dt - prev)*1e3:+.1f} ms", flush=True)
    prev = dt
