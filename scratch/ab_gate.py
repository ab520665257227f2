"""Isolate the scaffold gate cost: time the gated fw with (a) full gate
machinery, (b) _chunk_gates stubbed to None (no unpack, no gating — wrong
numerics, cost isolation only).  256^2, 256 samples, r=0.4 scaffold."""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import dataclasses
import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from benchmarks.renderer_speed import make_inputs, make_sphere_scaffold

rays, grid, dp = make_inputs(jax.random.PRNGKey(0), 256, tile_order=True)
scaffold = make_sphere_scaffold(0.4)


def bench(tag):
    def fwd(g, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            r, g, d, num_samples=256, gain=1.0, impl="pallas",
            tile_rays=256, scaffold=scaffold,
        )
        return sum(jnp.sum(o) for o in out)

    f = jax.jit(fwd)
    args = (grid, dp.mlp_params, rays.encoding)
    float(f(*args))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*args))
    print(f"{tag:24s} fw {((time.perf_counter()-t0)/n)*1e3:7.2f} ms",
          flush=True)


bench("gates full")
orig = rp._chunk_gates
rp._chunk_gates = lambda *a, **k: None
bench("gates stubbed (None)")
rp._chunk_gates = orig


