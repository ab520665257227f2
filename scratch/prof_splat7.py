"""Time the REAL sorted_plan / kernels with sum consumption (no slice DCE).
Run alone on chip: python scratch/prof_splat7.py [views]
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
print(f"chunk_r={chunk_r} chunks={n_chunks}", flush=True)

valid = jnp.ones((chunk_r,), jnp.float32)
geom_c = (rays.directions[:chunk_r], rays.origins[:chunk_r],
          rays.near[:chunk_r], rays.far[:chunk_r],
          rays.grid_idx[:chunk_r].astype(jnp.int32), valid)
enc_c = rays.encoding[:chunk_r]


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
    print(f"{name}: {dt*1e3:.1f} ms/chunk (x{n_chunks} = {dt*n_chunks*1e3:.0f} ms)",
          flush=True)
    return dt


@jax.jit
def plan_nopos(d, o, nr, fr, gi, v):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=False)
    return (jnp.sum(p["fzT"]) + jnp.sum(p["table"]).astype(jnp.float32)
            + jnp.sum(p["ray_pad"]).astype(jnp.float32))


@jax.jit
def plan_pos(d, o, nr, fr, gi, v):
    p = ss.sorted_plan(cfg, geo, (d, o, nr, fr, gi, v), want_pos=True)
    return (jnp.sum(p["fzT"]) + jnp.sum(p["table"]).astype(jnp.float32)
            + jnp.sum(p["ray_pad"]).astype(jnp.float32)
            + jnp.sum(p["pos_orig"]).astype(jnp.float32))


timeit("plan want_pos=False", plan_nopos, geom_c)
timeit("plan want_pos=True ", plan_pos, geom_c)

plan = jax.jit(
    lambda *g: ss.sorted_plan(cfg, geo, g, want_pos=True)
)(*geom_c)
plan = {k: jax.device_put(v) for k, v in plan.items()}
acc0 = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32)
vals = jax.jit(
    lambda e: ss.sorted_vals(geo, {"ray_pad": plan["ray_pad"]}, e, valid)
)(enc_c)


@jax.jit
def fw_kernel_only(v, acc):
    return jnp.sum(ss.sorted_splat_acc(cfg, geo, plan, v, acc)[:2])


timeit("fw kernel (sum[:2] rows)", fw_kernel_only, (vals, acc0))

gg = jnp.zeros((geo.PZ, geo.PY, geo.PXp, ss.CPAD), jnp.float32) + 0.1


@jax.jit
def bw_all(g):
    return jnp.sum(ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, g))


timeit("bw kernel+unsort+raysum", bw_all, (gg,))


@jax.jit
def bw_kernel_raw(g):
    # the Pallas gather kernel alone: consume its padded stream via a
    # cheap row-block sum (full output must be computed; out rows are
    # written by the kernel, not sliceable)
    BZ, BY = geo.BZ, geo.BY
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lightplane_tpu.ops.kernels import renderer_pallas as rp

    n_groups_cap = plan["fzT"].shape[0] // ss.BIN
    Npad = n_groups_cap * ss.GBINS * ss.BIN
    kernel = ss._build_bw_kernel(geo)
    smem = pl.BlockSpec((8, 128), lambda gq: (gq // 8, 0),
                        memory_space=pltpu.SMEM)
    coordT_spec = pl.BlockSpec((ss.BIN, ss.GBINS), lambda gq: (gq, 0),
                               memory_space=pltpu.VMEM)
    g_stream = pl.pallas_call(
        kernel,
        grid=(n_groups_cap,),
        in_specs=[smem, coordT_spec, coordT_spec, coordT_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ss.GBINS * ss.BIN, ss.CPAD),
                               lambda gq: (gq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Npad, ss.CPAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BZ, BY, geo.PXp, ss.CPAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=rp._COMPILER_PARAMS,
    )(plan["table"], plan["fzT"], plan["fyT"], plan["fxT"], g)
    return jnp.sum(g_stream[::997])


timeit("bw kernel alone", bw_kernel_raw, (gg,))
