"""Sorted-splatter stage ablation, tunnel-safe: every variant is ONE jit
returning a scalar, timed with chained data-dependent iterations (no
intermediate crosses the axon tunnel).  Run on chip, alone."""
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
print(f"R={R} chunks={n_chunks} chunk_r={chunk_r}")

valid = jnp.ones((R,), jnp.float32)
geom = (rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), valid)


def chunked(fn_chunk, enc):
    """Scan fn_chunk over equal ray chunks; sum scalar results."""
    Rp = n_chunks * chunk_r
    stack = lambda a: _pad_rows(a, Rp).reshape(
        (n_chunks, chunk_r) + a.shape[1:])
    xs = tuple(stack(a) for a in geom) + (stack(enc),)

    def body(acc, xs_c):
        return acc + fn_chunk(xs_c[:-1], xs_c[-1]), None

    out, _ = jax.lax.scan(body, 0.0, xs)
    return out


def v_plan(geom_c, enc_c):
    plan = ss.sorted_plan(cfg, geo, geom_c)
    return sum(jnp.sum(v[:8].astype(jnp.float32)) for v in plan.values())


def v_plan_vals(geom_c, enc_c):
    plan = ss.sorted_plan(cfg, geo, geom_c)
    vals = ss.sorted_vals(geo, plan, enc_c, geom_c[5])
    return jnp.sum(vals[:64])


def full_fw(enc):
    r = dataclasses.replace(rays, encoding=enc)
    f, w = lt.lightplane_splatter(
        r, list(sizes), num_samples=NS, return_list=False,
        impl="sorted"), None
    return jnp.sum(f[:64])


variants = [
    ("plan only", jax.jit(lambda e: chunked(v_plan, e))),
    ("plan+vals", jax.jit(lambda e: chunked(v_plan_vals, e))),
    ("full fw", jax.jit(full_fw)),
    ("full fwbw", jax.jit(
        jax.grad(lambda e: jnp.sum(
            lt.lightplane_splatter(
                dataclasses.replace(rays, encoding=e), list(sizes),
                num_samples=NS, return_list=False, impl="sorted",
            ) ** 2
        ))
    )),
]

enc0 = rays.encoding
for name, f in variants:
    out = f(enc0)
    jax.block_until_ready(out)

    def chain(n):
        e = enc0
        for _ in range(n):
            o = f(e)
            if o.ndim == 0:
                e = e + o * 1e-30
            else:
                e = e + o * 1e-30
        return np.asarray(o.ravel()[:1] if o.ndim else o)

    chain(1)
    t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
    chain(4); t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 3
    print(f"{name}: {dt*1e3:.0f} ms  ({R/dt:.0f} rays/s)")
