"""Splatter speed/memory benchmark.

Counterpart of reference ``tests/splatter_speed_benchmark.py:200-250``:
splats N views x 128^2 rays x 96 samples into a voxel grid (reference
config 160^3 x 64ch).  ``impl="auto"`` runs the sorted octet-binned
Pallas kernel for beyond-VMEM grids (any ray order) and the VMEM kernel
for small ones; ``--impls big sorted scan`` compares the other cores.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)

import jax
import jax.numpy as jnp

import lightplane_tpu as lt
from benchmarks.renderer_speed import analysis_mem_mb, peak_mem_mb


def make_rays(key, n_views, view_res, chn):
    """N posed camera views of view_res^2 rays each — the production
    splatting workload (lifting per-pixel image features into 3D).  The
    reference bench uses synthetic random rays instead
    (``tests/utils.py:230-268``); the sorted kernel handles either order
    at the same speed (``--shuffle`` to check)."""
    import numpy as np

    from lightplane_tpu.utils.cameras import camera_rays, sphere_cameras

    cams = sphere_cameras(n_views, radius=2.5, elevation_deg=25.0)
    all_o, all_d = [], []
    for c2w in cams:
        o, d = camera_rays(c2w, view_res, view_res, view_res * 1.1,
                           0.5, 3.5)
        all_o.append(o)
        all_d.append(d)
    n = n_views * view_res * view_res
    return lt.Rays(
        directions=jnp.asarray(np.concatenate(all_d)),
        origins=jnp.asarray(np.concatenate(all_o)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 0.5),
        far=jnp.full((n,), 3.5),
        encoding=jax.random.normal(key, (n, chn)) * 0.1,
    )


def bench_one(impl, n_views, view_res=128, grid_res=160, chn=64,
              num_samples=96, n_reps=3, shuffle=False, grid_kind="voxel"):
    rays = make_rays(jax.random.PRNGKey(0), n_views, view_res, chn)
    if shuffle:
        # destroy raster coherence: the boxed-DMA planner's fit flag fails
        # and the runtime falls back to the order-independent sorted kernel
        import numpy as np

        perm = np.random.default_rng(0).permutation(rays.directions.shape[0])
        rays = jax.tree_util.tree_map(lambda a: a[perm], rays)
    if grid_kind == "triplane":
        # the lightplane paper's LRM-style lift: multi-view features into
        # one big triplane
        sizes = [
            (1, 1, grid_res, grid_res, chn),
            (1, grid_res, 1, grid_res, chn),
            (1, grid_res, grid_res, 1, chn),
        ]
    else:
        sizes = [(1, grid_res, grid_res, grid_res, chn)]

    def fwd(enc):
        r = dataclasses.replace(rays, encoding=enc)
        return lt.lightplane_splatter(
            r, sizes, num_samples=num_samples, return_list=False, impl=impl
        )

    def loss(enc):
        return jnp.sum(fwd(enc) ** 2)

    f_fwd = jax.jit(fwd).lower(rays.encoding).compile()
    f_bwd = jax.jit(jax.grad(loss)).lower(rays.encoding).compile()

    # ``block_until_ready`` can no-op through the axon tunnel: chain
    # iterations through a data dependency and sync with one D2H,
    # subtracting the 1-iter run (same fixed dispatch/D2H cost) — the
    # bench.py methodology.
    import numpy as np

    def chain_fwd(n):
        e = rays.encoding
        for _ in range(n):
            g = f_fwd(e)
            e = e + g.ravel()[0] * 1e-30
        return np.asarray(g.ravel()[:1])

    def chain_bwd(n):
        e = rays.encoding
        for _ in range(n):
            ge = f_bwd(e)
            e = e + ge * 1e-30
        return np.asarray(ge.ravel()[:1])

    res = {}
    for name, chain in [("fw", chain_fwd), ("fwbw", chain_bwd)]:
        chain(1)  # compile + warmup
        t0 = time.perf_counter()
        chain(1)
        t1 = time.perf_counter()
        chain(n_reps + 1)
        t2 = time.perf_counter()
        res[name] = ((t2 - t1) - (t1 - t0)) / n_reps
    mem = peak_mem_mb()
    if mem != mem:  # runtime stats unavailable: compile-time estimate
        mem = max(analysis_mem_mb(f_fwd), analysis_mem_mb(f_bwd))
    res["mem_mb"] = mem
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, nargs="*", default=[1, 4, 16, 64])
    p.add_argument("--impls", type=str, nargs="*", default=["auto"])
    p.add_argument("--grid_res", type=int, default=160)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--grid", type=str, default="voxel",
                   choices=["voxel", "triplane"])
    args = p.parse_args()

    print("STATS,impl,n_views,n_rays,t_fw_ms,t_fwbw_ms,rays_per_s_fwbw,"
          "peak_mem_mb")
    # encode the non-default config in the impl column so CSV rows from
    # different runs stay distinguishable (mirrors renderer_speed.py)
    label_bits = [f"+{args.grid}{args.grid_res}"]
    if args.channels != 64:
        label_bits.append(f"c{args.channels}")
    if args.shuffle:
        label_bits.append("+shuffle")
    label = "".join(label_bits)
    for impl in args.impls:
        for v in args.views:
            n = v * 128 * 128
            try:
                r = bench_one(impl, v, grid_res=args.grid_res,
                              chn=args.channels, shuffle=args.shuffle,
                              grid_kind=args.grid)
            except Exception as e:
                msg = " ".join(str(e).split())[:160]
                print(f"STATS,{impl}{label},{v},{n},ERROR,{type(e).__name__},,")
                print(f"#   {msg}", file=sys.stderr)
                continue
            print(
                f"STATS,{impl}{label},{v},{n},{r['fw']*1e3:.2f},"
                f"{r['fwbw']*1e3:.2f},{n/r['fwbw']:.0f},{r['mem_mb']:.0f}"
            )


if __name__ == "__main__":
    main()
