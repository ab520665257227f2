import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
import bench

rays, grid, dp = bench.make_inputs(jax.random.PRNGKey(0))
n_rays = rays.directions.shape[0]

def run(tag, ablate, grad=True):
    rp.ABLATE = frozenset(ablate)
    def fwd(grid, mlp_params, encoding):
        r = dataclasses.replace(rays, encoding=encoding)
        d = dataclasses.replace(dp, mlp_params=mlp_params)
        return lt.lightplane_renderer(r, grid, d, num_samples=bench.NUM_SAMPLES, gain=1.0)
    def loss(grid, mlp_params, encoding):
        depth, nlt, feat = fwd(grid, mlp_params, encoding)
        return jnp.sum(feat) + jnp.sum(depth) + jnp.sum(nlt)
    if grad:
        f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        def chain(n):
            g = grid
            for _ in range(n):
                gg, gm, ge = f(g, dp.mlp_params, rays.encoding)
                g = [a + b * 1e-30 for a, b in zip(g, gg)]
            return np.asarray(gm[:1])
    else:
        f = jax.jit(fwd)
        def chain(n):
            g = grid
            for _ in range(n):
                d, nl, ft = f(g, dp.mlp_params, rays.encoding)
                g = [a + d[0] * 1e-30 for a in g]
            return np.asarray(d[:1])
    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(11)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 10
    print(f"{tag:34s} {dt*1e3:7.2f} ms", flush=True)

run("fw noea", ("noea",), grad=False)
run("fw nogeom", ("nogeom",), grad=False)
run("fw nosample", ("nosample",), grad=False)
run("fwbw nogeom", ("nogeom",))
