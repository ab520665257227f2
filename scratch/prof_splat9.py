"""Surgical Phase-A stage timings for the gen-2 sorted splatter.
Times by queueing n identical dispatches + one tiny D2H sync (no
harness adds).  Run alone on chip: python scratch/prof_splat9.py
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
N = chunk_r * NS
print(f"chunk_r={chunk_r} chunks={n_chunks} N={N} CPAD={geo.CPAD} "
      f"n_keys={geo.n_keys}", flush=True)


def timeit(name, fn, *args, reps=6):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    first = lambda o: (o[0] if isinstance(o, (tuple, list)) else o)

    def run(n):
        for _ in range(n):
            o = g(*args)
        return np.asarray(jnp.ravel(first(o))[:1])

    run(1)
    t0 = time.perf_counter(); run(1); t1 = time.perf_counter()
    run(reps + 1); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


d, o, nr, fr, gi, v = geom_c


# --- stage 1: key build (march + bucket) ---
def keys_of(d, o, nr, fr, gi, v):
    S = cfg.tot_num_samples
    step = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                            (chunk_r, S))
    pts = ss._march_points(cfg, o[:, None, :], d[:, None, :],
                          nr[:, None], fr[:, None], step)
    fz, fy, fx = ss._kernel_coords(geo, pts, gi[:, None])
    cz = jnp.clip(jnp.floor(fz), 0, geo.Dk - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(fy), 0, geo.Hk - 1).astype(jnp.int32)
    cx = jnp.clip(jnp.floor(fx), 0, geo.Wk - 1).astype(jnp.int32)
    sz, sy = cz // geo.SUPZ, cy // geo.SUPY
    lz = (cz // ss.OCT) % geo.lz_n if geo.Dk > 1 else cz * 0
    ly = (cy // ss.OCT) % geo.ly_n
    lx = cx // ss.OCT
    key = ((sz * geo.nsy + sy) * geo.n_loc
           + (lz * geo.ly_n + ly) * geo.n_loc_x + lx)
    live = ((fz > -1.0) & (fz < geo.Dk) & (fy > -1.0) & (fy < geo.Hk)
            & (fx > -1.0) & (fx < geo.Wk)) & (v[:, None] > 0)
    return jnp.where(live, key, geo.n_keys).reshape(N)


timeit("keys (march+bucket)", keys_of, *geom_c)
key = jax.jit(keys_of)(*geom_c)
idx = jnp.arange(N, dtype=jnp.int32)

# --- sorts ---
timeit("sort num_keys=1", lambda k, i: jax.lax.sort(
    (k, i), num_keys=1, is_stable=False), key, idx)
timeit("sort num_keys=2", lambda k, i: jax.lax.sort(
    (k, i), num_keys=2, is_stable=False), key, idx)

key_s, idx_s = jax.jit(lambda k, i: jax.lax.sort(
    (k, i), num_keys=2, is_stable=False))(key, idx)

# --- bounds + src construction (no big gathers) ---
nbc, ngc = ss._caps(geo, N)
n_bins_pad = ngc * ss.GBINS
Npad = n_bins_pad * ss.BIN
print(f"Npad={Npad} ngc={ngc}", flush=True)


def src_of(key_s):
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
    octet_bin_start = ((gstart[:-1] * ss.GBINS)[:, None] + obo).reshape(
        geo.n_keys).astype(jnp.int32)
    b = jnp.arange(n_bins_pad, dtype=jnp.int32)
    bin_oct = (jnp.searchsorted(octet_bin_start, b, side="right") - 1
               ).astype(jnp.int32)
    bin_oct = jnp.clip(bin_oct, 0, geo.n_keys - 1)
    rank0 = (b - jnp.take(octet_bin_start, bin_oct)) * ss.BIN
    src_base = jnp.take(bounds, bin_oct) + rank0
    cnt_b = jnp.take(counts, bin_oct)
    j = jnp.arange(ss.BIN, dtype=jnp.int32)[None]
    valid_slot = (rank0[:, None] + j) < cnt_b[:, None]
    return jnp.where(valid_slot, src_base[:, None] + j, N).reshape(Npad), \
        bounds, octet_bin_start


timeit("bounds+src build", src_of, key_s)
src, bounds, obs = jax.jit(src_of)(key_s)

# --- the big gathers, individually ---
idx_s_app = jnp.concatenate([idx_s, jnp.full((1,), N, jnp.int32)])
timeit("slot_sample = take(idx_s, src) [Npad]",
       lambda a, s: jnp.take(a, s), idx_s_app, src)
slot_sample = jnp.take(idx_s_app, src)
ray_gid = jnp.minimum(slot_sample // NS, chunk_r)

tblv = jnp.zeros((chunk_r + 1, 128), jnp.float32)
timeit("merged rows = take(tblv128, ray_gid) [Npad]",
       lambda t, r: jnp.take(t, r, axis=0), tblv, ray_gid)

tbl9 = jnp.zeros((chunk_r + 1, 9), jnp.float32)
timeit("g9 rows = take(tbl9, ray_gid) [Npad]",
       lambda t, r: jnp.take(t, r, axis=0), tbl9, ray_gid)

tbl2 = jnp.zeros((geo.n_keys + 1, 2), jnp.int32)
timeit("pos tbl2 = take(tbl2, key_s) [N]",
       lambda t, k: jnp.take(t, jnp.minimum(k, geo.n_keys), axis=0),
       tbl2, key_s)

# --- second sort (inverse) ---
pos = jnp.where(key_s == geo.n_keys, Npad, src[:N] * 0 + idx_s)  # proxy
timeit("sort2 (idx_s, pos)", lambda a, b: jax.lax.sort(
    (a, b), num_keys=1, is_stable=False), idx_s, pos)

# --- coords math + transposes ---
rows = jnp.take(tblv, ray_gid, axis=0)


def coords_T(rows, slot_sample):
    g9s = rows[:, geo.CPAD: geo.CPAD + 9]
    step = slot_sample % NS
    pts = ss._march_points(cfg, g9s[:, 0:3], g9s[:, 3:6], g9s[:, 6],
                          g9s[:, 7], step)
    fz, fy, fx = ss._kernel_coords(geo, pts, g9s[:, 8].astype(jnp.int32))
    pad = slot_sample == N
    gT = lambda c: (c.reshape(ngc, ss.GBINS, ss.BIN)
                    .transpose(0, 2, 1).reshape(ngc * ss.BIN, ss.GBINS))
    return (gT(jnp.where(pad, 1e9, fz)), gT(jnp.where(pad, 1e9, fy)),
            gT(jnp.where(pad, 1e9, fx)))


timeit("coords math + 3 transposes", coords_T, rows, slot_sample)

# --- unsort gather at 128 lanes ---
g_stream = jnp.zeros((Npad + 1, 128), jnp.float32)
pos_orig = jax.random.permutation(
    jax.random.PRNGKey(1), Npad)[:N].astype(jnp.int32)
timeit("unsort take(g_stream128, pos_orig[N]) + raysum",
       lambda g, p: jnp.take(g, p, axis=0).reshape(
           chunk_r, NS, 128).sum(axis=1),
       g_stream, pos_orig)

# with the REAL pos_orig (locality from 2-key sort)
plan = jax.jit(lambda *g: ss.sorted_plan(
    cfg, geo, g[:-1], want_pos=True, feat_aug=g[-1]
))(*(geom_c + (feat_aug,)))
timeit("unsort with REAL pos_orig + raysum",
       lambda g, p: jnp.take(g, p, axis=0).reshape(
           chunk_r, NS, 128).sum(axis=1),
       g_stream, plan["pos_orig"])

# --- full plan for reference ---
timeit("sorted_plan(pos, feat) FULL",
       lambda *g: ss.sorted_plan(cfg, geo, g[:-1], want_pos=True,
                                 feat_aug=g[-1])["fzT"],
       *(geom_c + (feat_aug,)))

# --- kernels with donated accumulator ---
vals = plan.pop("vals")
plan_dev = {k: jax.device_put(v) for k, v in plan.items()}
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32)
fwk = jax.jit(
    lambda a: ss.sorted_splat_acc(cfg, geo, plan_dev, vals, a),
    donate_argnums=0,
)
a = fwk(acc0)
jax.block_until_ready(a)


def run_fw(n, a):
    for _ in range(n):
        a = fwk(a)
    np.asarray(a[:1, :1, :1])
    return a


a = run_fw(1, a)
t0 = time.perf_counter(); a = run_fw(1, a); t1 = time.perf_counter()
a = run_fw(7, a); t2 = time.perf_counter()
print(f"fw kernel (donated acc): {((t2-t1)-(t1-t0))/6*1e3:.1f} ms",
      flush=True)

gg = jnp.zeros((geo.PZ, geo.PY, geo.LX), jnp.float32)
timeit("bw kernel+unsort+raysum (zero gg)",
       lambda g: ss.sorted_splat_bwd(cfg, geo, plan_dev, chunk_r, g), gg)
