import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
import bench

rays, grid, dp = bench.make_inputs(jax.random.PRNGKey(0))
n_rays = rays.directions.shape[0]

def run(tag):
    def loss(grid, mlp_params, encoding):
        r = dataclasses.replace(rays, encoding=encoding)
        d = dataclasses.replace(dp, mlp_params=mlp_params)
        depth, nlt, feat = lt.lightplane_renderer(r, grid, d, num_samples=bench.NUM_SAMPLES, gain=1.0)
        return jnp.sum(feat) + jnp.sum(depth) + jnp.sum(nlt)
    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    def chain(n):
        g = grid
        for _ in range(n):
            gg, gm, ge = f(g, dp.mlp_params, rays.encoding)
            g = [a + b * 1e-30 for a, b in zip(g, gg)]
        return np.asarray(gm[:1])
    try:
        chain(1)
    except Exception as e:
        print(f"{tag:40s} FAIL {str(e)[:90]}", flush=True)
        return
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(11)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / 10
    print(f"{tag:40s} {dt*1e3:7.2f} ms ({n_rays/dt/1e3:.0f}k rays/s)", flush=True)

for kfw, kbw, wf in ((8, 8, 8), (16, 8, 8), (16, 16, 8), (32, 16, 8),
                     (16, 16, 16), (8, 8, 16)):
    rp.MARCH_CHUNK = kfw
    rp.MARCH_CHUNK_BW_WIN = kbw
    rp.WINDOW_FRACTION = wf
    run(f"K_fw={kfw} K_bw={kbw} WF={wf}")
