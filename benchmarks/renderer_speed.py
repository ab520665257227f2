"""Renderer speed/memory benchmark.

Counterpart of reference ``tests/renderer_speed_benchmark.py:228-287``:
triplane 3 x (32^2, 32ch), 256 samples/ray, MLPs 2/2/2 hidden 32, render
sizes 16^2 .. 1024^2; times forward and forward+backward separately for the
available implementations and reports rays/s and peak device memory.
Emits CSV ``STATS,`` lines like the reference.

Usage: python benchmarks/renderer_speed.py [--sizes 64 128 256] [--impls pallas scan]
       [--tile_order]   # tile-major ray order (the packed 2D-window fast path)
"""

import argparse
import dataclasses
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)

import jax
import jax.numpy as jnp
import numpy as np

import lightplane_tpu as lt


def make_inputs(key, image_size, res=32, chn=32, hidden=32, n_layers=2,
                tile_order=False, tile=None, grid_kind="triplane"):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dp = lt.init_decoder_params(
        k1, n_layers_opacity=n_layers, n_layers_trunk=n_layers,
        n_layers_color=n_layers, input_chn=chn, hidden_chn=hidden,
        color_chn=3, opacity_init_bias=-2.0,
    )
    if grid_kind == "voxel":
        grid = [jax.random.normal(k2, (1, res, res, res, chn)) * 0.1]
    else:
        grid = [
            jax.random.normal(k2, (1, 1, res, res, chn)) * 0.1,
            jax.random.normal(k3, (1, res, 1, res, chn)) * 0.1,
            jax.random.normal(k4, (1, res, res, 1, chn)) * 0.1,
        ]
    n = image_size * image_size
    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.5, 0.5, image_size),
        jnp.linspace(-0.5, 0.5, image_size),
        indexing="ij",
    )
    directions = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], axis=-1)
    if tile_order:
        from lightplane_tpu.ops.rays import default_tile

        if tile is None:
            tile = default_tile(image_size, image_size)
        order, _ = lt.tile_ray_order(image_size, image_size, tile=tile)
        directions = directions[order]
    rays = lt.Rays(
        directions=directions,
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.0),
        far=jnp.full((n,), 3.0),
        encoding=jax.random.normal(k5, (n, hidden)) * 0.1,
    )
    return rays, grid, dp


def peak_mem_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**20
    except Exception:
        pass
    return float("nan")


def analysis_mem_mb(compiled):
    """Compile-time peak-HBM estimate (argument + output + temp) from XLA's
    buffer assignment — works where runtime ``memory_stats()`` is
    unavailable (e.g. through the axon device tunnel)."""
    try:
        ma = compiled.memory_analysis()
        total = (
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
        )
        return total / 2**20
    except Exception:
        return float("nan")


def make_sphere_scaffold(radius, res=64):
    """Binary occupancy of a centered sphere — the sparse-scene scaffold
    benchmark case.  Rays whose march chunks all miss the sphere take the
    kernels' whole-chunk skip branch (``_scaffold_chunk_skip``)."""
    c = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    z, y, x = jnp.meshgrid(c, c, c, indexing="ij")
    occ = (z * z + y * y + x * x) <= radius * radius
    return occ.astype(jnp.float32)[None]                 # [1, res^3]


def bench_one(impl, image_size, num_samples, n_reps=5, tile_order=False,
              tile=None, scaffold_radius=None, grid_kind="triplane",
              grid_res=32, contract=False, w3_auto_budget=False):
    from lightplane_tpu.ops.rays import default_tile

    if tile_order and tile is None:
        tile = default_tile(image_size, image_size)
        # beyond-VMEM grids run the W3 boxed-DMA kernels, which need
        # compact square-ish pixel tiles (mirrors _image_tile_reorder)
        from lightplane_tpu.ops.kernels.renderer_pallas import (
            MAX_CELLS_PER_GRID,
        )

        if grid_res ** (3 if grid_kind == "voxel" else 2) > \
                MAX_CELLS_PER_GRID:
            from lightplane_tpu.ops.kernels.renderer_w3 import W3_TILE

            if image_size % W3_TILE[0] == 0 and image_size % W3_TILE[1] == 0:
                tile = W3_TILE
    rays, grid, dp = make_inputs(
        jax.random.PRNGKey(0), image_size, tile_order=tile_order, tile=tile,
        grid_kind=grid_kind, res=grid_res,
    )
    tile_rays = tile[0] * tile[1] if (tile_order and tile) else None
    scaffold = (
        make_sphere_scaffold(scaffold_radius)
        if scaffold_radius else None
    )
    w3_budget = None
    if w3_auto_budget:
        # per-rig probe: the tightest W3 window budget whose plan fits
        # this camera (one eager planner evaluation per candidate)
        w3_budget = lt.suggest_w3_budget(
            rays, grid, dp, num_samples=num_samples,
            contract_coords=contract, tile_rays=tile_rays,
        )
        print(f"# w3_auto_budget -> {w3_budget}")

    def fwd(grid, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        return lt.lightplane_renderer(
            r, grid, d, num_samples=num_samples, gain=1.0, impl=impl,
            tile_rays=tile_rays, scaffold=scaffold,
            contract_coords=contract, w3_budget=w3_budget,
        )

    def loss(grid, mp, enc):
        out = fwd(grid, mp, enc)
        return sum(jnp.sum(o) for o in out)

    f_fwd = jax.jit(fwd).lower(grid, dp.mlp_params, rays.encoding).compile()
    f_bwd = (
        jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        .lower(grid, dp.mlp_params, rays.encoding)
        .compile()
    )

    # ``block_until_ready`` can no-op on some backends (axon tunnel):
    # chain iterations through a data dependency and sync with one D2H;
    # subtract the 1-iter run, which carries the same fixed cost.
    def chain_bwd(n):
        g = grid
        for _ in range(n):
            gg, gm, ge = f_bwd(g, dp.mlp_params, rays.encoding)
            g = [a + b * 1e-30 for a, b in zip(g, gg)]
        return np.asarray(gm[:1])

    def chain_fwd(n):
        g = grid
        for _ in range(n):
            depth, nlt, feat = f_fwd(g, dp.mlp_params, rays.encoding)
            g = [a + nlt[0, None, None, None, None] * 1e-30 for a in g]
        return np.asarray(depth[:1])

    results = {}
    for name, chain in [("fw", chain_fwd), ("fwbw", chain_bwd)]:
        chain(1)  # compile + warmup
        t0 = time.perf_counter()
        chain(1)
        t1 = time.perf_counter()
        chain(n_reps + 1)
        t2 = time.perf_counter()
        results[name] = ((t2 - t1) - (t1 - t0)) / n_reps
    mem = peak_mem_mb()
    if mem != mem:  # runtime stats unavailable: compile-time estimate
        mem = max(analysis_mem_mb(f_fwd), analysis_mem_mb(f_bwd))
    results["mem_mb"] = mem
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="*",
                   default=[16, 32, 64, 128, 256, 512, 1024])
    p.add_argument("--impls", type=str, nargs="*",
                   default=["pallas", "scan"])
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--tile_order", action="store_true")
    p.add_argument("--tile", type=int, nargs=2, default=None)
    p.add_argument(
        "--scaffold_radius", type=float, default=None,
        help="sparse-scene mode: gate the march with a centered-sphere "
             "occupancy scaffold of this radius (world units; ~0.55 -> "
             "~23%% of rays hit)",
    )
    p.add_argument("--grid", type=str, default="triplane",
                   choices=["triplane", "voxel"])
    p.add_argument("--grid_res", type=int, default=32,
                   help="cells per grid axis (triplane planes or voxel)")
    p.add_argument("--contract", action="store_true",
                   help="MeRF coordinate contraction (unbounded scenes)")
    p.add_argument(
        "--w3_auto_budget", action="store_true",
        help="probe the tightest-fitting W3 window budget for this rig "
             "(lt.suggest_w3_budget) before compiling",
    )
    p.add_argument(
        "--scaffold_sweep", action="store_true",
        help="crossover mode: sweep scaffold sphere radius x num_samples "
             "at one image size and report speedup vs the ungated run "
             "(finds the sparsity where gating pays; VERDICT r4 item 5)",
    )
    args = p.parse_args()

    if args.scaffold_sweep:
        size = args.sizes[0] if args.sizes else 256
        print("STATS,impl,image_size,num_samples,radius,occupancy_frac,"
              "t_fwbw_ms,rays_per_s_fwbw,speedup_vs_ungated")
        for ns in ([args.num_samples] if args.num_samples != 256
                   else [128, 256, 512]):
            base = None
            for radius in [None, 0.7, 0.55, 0.4, 0.25, 0.15]:
                try:
                    r = bench_one(
                        "pallas", size, ns, tile_order=args.tile_order,
                        scaffold_radius=radius, grid_kind=args.grid,
                        grid_res=args.grid_res,
                    )
                except Exception as e:
                    print(f"STATS,pallas,{size},{ns},{radius},ERROR,"
                          f"{type(e).__name__},,")
                    continue
                n = size * size
                if radius is None:
                    base = r["fwbw"]
                    occ = 1.0
                else:
                    occ = float(
                        make_sphere_scaffold(radius).mean()
                    )
                speed = base / r["fwbw"] if base else float("nan")
                print(
                    f"STATS,pallas,{size},{ns},{radius},{occ:.4f},"
                    f"{r['fwbw']*1e3:.2f},{n/r['fwbw']:.0f},{speed:.3f}"
                )
        return

    label = (
        f"+sc{args.scaffold_radius}" if args.scaffold_radius else ""
    )
    if args.grid != "triplane" or args.grid_res != 32:
        label += f"+{args.grid}{args.grid_res}"
    if args.contract:
        label += "+contract"
    print("STATS,impl,image_size,n_rays,t_fw_ms,t_fwbw_ms,"
          "rays_per_s_fwbw,peak_mem_mb")
    for impl in args.impls:
        for size in args.sizes:
            try:
                r = bench_one(
                    impl, size, args.num_samples,
                    tile_order=args.tile_order,
                    tile=tuple(args.tile) if args.tile else None,
                    scaffold_radius=args.scaffold_radius,
                    grid_kind=args.grid, grid_res=args.grid_res,
                    contract=args.contract,
                    w3_auto_budget=args.w3_auto_budget,
                )
            except Exception as e:
                print(f"STATS,{impl}{label},{size},{size*size},ERROR,"
                      f"{type(e).__name__},,")
                continue
            n = size * size
            print(
                f"STATS,{impl}{label},{size},{n},{r['fw']*1e3:.2f},"
                f"{r['fwbw']*1e3:.2f},{n/r['fwbw']:.0f},"
                f"{r['mem_mb']:.0f}"
            )


if __name__ == "__main__":
    main()
