"""W3 big-voxel fw ablation: which stage eats the 160 ms?"""
import dataclasses, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from benchmarks.renderer_speed import make_inputs

rays, grid, dp = make_inputs(
    jax.random.PRNGKey(0), 256, res=64, tile_order=True, tile=(8, 8),
    grid_kind="voxel",
)
n_rays = rays.directions.shape[0]

def run(tag, ablate):
    rp.ABLATE = frozenset(ablate)
    def fwd(grid, mlp_params, encoding):
        r = dataclasses.replace(rays, encoding=encoding)
        d = dataclasses.replace(dp, mlp_params=mlp_params)
        return lt.lightplane_renderer(
            r, grid, d, num_samples=256, gain=1.0, impl="pallas",
            tile_rays=64,
        )
    f = jax.jit(fwd)
    def chain(n):
        g = grid
        for _ in range(n):
            d, nl, ft = f(g, dp.mlp_params, rays.encoding)
            g = [a + d[0] * 1e-30 for a in g]
        return np.asarray(d[:1])
    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(7)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 6
    print(f"{tag}: {dt*1e3:.1f} ms fw", flush=True)

run("nostencil", ["nostencil"])
run("noxfold", ["noxfold"])
run("nostencil+nomlp+noea", ["nostencil", "nomlp", "noea"])
