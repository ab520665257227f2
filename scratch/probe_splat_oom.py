"""Probe round-2: which splatter impl OOMs at 16 views, and what does
compile-time memory_analysis say?  fw-only, uncontended."""
import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import lightplane_tpu as lt
from benchmarks.splatter_speed import make_rays

p = argparse.ArgumentParser()
p.add_argument("--impl", default="big")
p.add_argument("--views", type=int, default=16)
p.add_argument("--bwd", action="store_true")
p.add_argument("--compile_only", action="store_true")
args = p.parse_args()

rays = make_rays(jax.random.PRNGKey(0), args.views, 128, 64)
sizes = [(1, 160, 160, 160, 64)]


def fwd(enc):
    r = dataclasses.replace(rays, encoding=enc)
    return lt.lightplane_splatter(
        r, sizes, num_samples=96, return_list=False, impl=args.impl
    )


fn = fwd if not args.bwd else jax.grad(lambda e: jnp.sum(fwd(e) ** 2))
t0 = time.perf_counter()
lowered = jax.jit(fn).lower(rays.encoding)
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s")
ma = compiled.memory_analysis()
if ma is not None:
    gb = 1024 ** 3
    print(f"argument: {ma.argument_size_in_bytes/gb:.2f} GiB")
    print(f"output:   {ma.output_size_in_bytes/gb:.2f} GiB")
    print(f"temp:     {ma.temp_size_in_bytes/gb:.2f} GiB")
    print(f"total:    {(ma.argument_size_in_bytes+ma.output_size_in_bytes+ma.temp_size_in_bytes)/gb:.2f} GiB")
if args.compile_only:
    sys.exit(0)
t0 = time.perf_counter()
out = compiled(rays.encoding)
jax.block_until_ready(out)
print(f"run1: {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for _ in range(3):
    out = compiled(rays.encoding)
jax.block_until_ready(out)
n = args.views * 128 * 128
dt = (time.perf_counter() - t0) / 3
print(f"run: {dt*1e3:.1f} ms  rays/s: {n/dt:,.0f}")
