"""Micro-probes for the W3 (big-voxel) renderer design.

1. scan-path voxel 64^3x32 render at 256^2, 256 samples (the bar to beat)
2. in-kernel cost of N dynamic row-slices + concat (g_win build)
3. in-kernel cost of [M, window] hat-stencil build + sample matmul
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

p = argparse.ArgumentParser()
p.add_argument("case", choices=["scan", "slices", "stencil", "slices3d"])
p.add_argument("--n_slices", type=int, default=64)
p.add_argument("--win", type=int, default=512)
p.add_argument("--M", type=int, default=512)
p.add_argument("--iters", type=int, default=256)
p.add_argument("--size", type=int, default=128)
args = p.parse_args()


def timeit(fn, *a, reps=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


if args.case == "scan":
    import sys, os
    sys.path.insert(0, "/root/repo")
    import dataclasses
    import lightplane_tpu as lt
    from tests.utils import random_decoder_params
    from lightplane_tpu.utils.cameras import camera_rays

    res = args.size
    n = res * res
    o, d = camera_rays(np.eye(4), res, res, res * 1.1, 0.5, 3.5)
    # camera at z=-2.5 looking at origin
    o = o + np.array([0.0, 0.0, -2.5])
    rays = lt.Rays(
        directions=jnp.asarray(d), origins=jnp.asarray(o),
        grid_idx=jnp.zeros((n,), jnp.int32), near=jnp.full((n,), 0.5),
        far=jnp.full((n,), 3.5),
        encoding=jax.random.normal(jax.random.PRNGKey(0), (n, 32)) * 0.1,
    )
    grid = [jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 64, 32)) * 0.1]
    dp = random_decoder_params(jax.random.PRNGKey(2), input_chn=32,
                               hidden_chn=32, color_chn=3)

    def fwd(g, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        dpp = dataclasses.replace(dp, mlp_params=mp)
        return lt.lightplane_renderer(r, g, dpp, num_samples=256, gain=1.0,
                                      impl="scan")

    def loss(g, mp, enc):
        return sum(jnp.sum(x) for x in fwd(g, mp, enc))

    f = jax.jit(fwd)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_fw = timeit(lambda: f(grid, dp.mlp_params, rays.encoding), reps=3)
    print(f"scan fw {res}^2: {t_fw*1e3:.1f} ms  ({n/t_fw:,.0f} rays/s)")
    t_bw = timeit(lambda: fb(grid, dp.mlp_params, rays.encoding), reps=3)
    print(f"scan fwbw {res}^2: {t_bw*1e3:.1f} ms  ({n/t_bw:,.0f} rays/s)")

elif args.case == "slices":
    # N dynamic row slices of [8, 32] + concat, per loop iteration
    V, C, NS = 262144, 32, args.n_slices

    def kernel(starts_ref, g_ref, out_ref):
        def body(i, acc):
            pieces = []
            for j in range(NS):
                s = starts_ref[0, (i * NS + j) % 128]
                pieces.append(g_ref[pl.ds(s, 8), :])
            gw = jnp.concatenate(pieces, axis=0)  # [NS*8, C]
            return acc + jnp.sum(gw)
        out_ref[0, 0] = jax.lax.fori_loop(0, args.iters, body, 0.0)

    g = jax.random.normal(jax.random.PRNGKey(0), (V, C))
    starts = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, V - 8,
                                dtype=jnp.int32)
    f = jax.jit(lambda s, g: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(s, g))
    t = timeit(f, starts, g)
    per = t / args.iters
    print(f"{NS} slices+concat: {per*1e6:.2f} us/iter "
          f"({per/NS*1e9:.0f} ns/slice), total {t*1e3:.2f} ms/"
          f"{args.iters} iters")

elif args.case == "stencil":
    # [M, win] 3-axis hat build + [M, win] @ [win, 32] matmul per iter
    M, WIN, C = args.M, args.win, 32

    def kernel(pts_ref, g_ref, out_ref):
        li = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        xv = (li % 8).astype(jnp.float32)
        yv = ((li // 8) % 8).astype(jnp.float32)
        zv = (li // 64).astype(jnp.float32)

        def body(i, acc):
            f = pts_ref[:, :] + i * 1e-6
            fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
            st = (jnp.maximum(0.0, 1.0 - jnp.abs(xv - fx))
                  * jnp.maximum(0.0, 1.0 - jnp.abs(yv - fy))
                  * jnp.maximum(0.0, 1.0 - jnp.abs(zv - fz)))
            smp = jnp.dot(st, g_ref[:, :],
                          preferred_element_type=jnp.float32)
            return acc + jnp.sum(smp)
        out_ref[0, 0] = jax.lax.fori_loop(0, args.iters, body, 0.0)

    pts = jax.random.uniform(jax.random.PRNGKey(0), (M, 3)) * 8
    g = jax.random.normal(jax.random.PRNGKey(1), (WIN, C))
    f = jax.jit(lambda p_, g_: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(p_, g_))
    t = timeit(f, pts, g)
    per = t / args.iters
    per_sample = per / M
    print(f"stencil M={M} win={WIN}: {per*1e6:.2f} us/iter, "
          f"{per_sample*1e9:.2f} ns/sample "
          f"(256^2x256smp => {per_sample*16.8e6*1e3:.1f} ms/pass)")

if args.case == "slices3d":
    D, HW, C, NS = 64, 4096, 32, args.n_slices

    def kernel(starts_ref, g_ref, out_ref):
        def body(i, acc):
            pieces = []
            for j in range(NS):
                z = starts_ref[0, (i * NS + j) % 128] % D
                s = starts_ref[0, (i * NS + j + 1) % 128] % (HW - 8)
                pieces.append(g_ref[z, pl.ds(s, 8), :])
            gw = jnp.concatenate(pieces, axis=0)
            return acc + jnp.sum(gw)
        out_ref[0, 0] = jax.lax.fori_loop(0, args.iters, body, 0.0)

    g = jax.random.normal(jax.random.PRNGKey(0), (D, HW, C))
    starts = jax.random.randint(jax.random.PRNGKey(1), (1, 128), 0, 10**6,
                                dtype=jnp.int32)
    f = jax.jit(lambda s, g: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(s, g))
    t = timeit(f, starts, g)
    per = t / args.iters
    print(f"3d {NS} slices+concat: {per*1e6:.2f} us/iter "
          f"({per/NS*1e9:.0f} ns/slice)")
