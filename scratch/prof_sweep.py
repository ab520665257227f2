"""Knob sweep on the headline bench config (run on real TPU)."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp

import bench


import numpy as np

def timeit(f, *args, n=10):
    def chain(m):
        a0 = args[0]
        out = None
        for _ in range(m):
            out = f(a0, *args[1:])
            lead = out[0] if isinstance(out, tuple) else out
            lead = lead[0] if isinstance(lead, list) else lead
            a0 = [g + lead.ravel()[0] * 1e-30 for g in a0]
        flat = out
        while isinstance(flat, (tuple, list)):
            flat = flat[0]
        return np.asarray(flat).ravel()[:1]
    chain(1)
    t0 = time.perf_counter(); chain(1)
    t1 = time.perf_counter(); chain(n + 1)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / n


def run(tag, compute_dtype="float32"):
    rays, grid, dp = bench.make_inputs(jax.random.PRNGKey(0))
    n_rays = rays.directions.shape[0]

    def fwd(grid, mlp_params, encoding):
        r = dataclasses.replace(rays, encoding=encoding)
        d = dataclasses.replace(dp, mlp_params=mlp_params)
        return lt.lightplane_renderer(
            r, grid, d, num_samples=bench.NUM_SAMPLES, gain=1.0,
            compute_dtype=compute_dtype,
        )

    def loss(grid, mlp_params, encoding):
        depth, nlt, feat = fwd(grid, mlp_params, encoding)
        return jnp.sum(feat) + jnp.sum(depth) + jnp.sum(nlt)

    args = (grid, dp.mlp_params, rays.encoding)
    f_fw = jax.jit(fwd)
    f_fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_fw = timeit(f_fw, *args)
    t_fb = timeit(f_fb, *args)
    print(f"{tag:40s} fw {t_fw*1e3:7.2f} ms ({n_rays/t_fw/1e3:7.1f}k r/s)  "
          f"fw+bw {t_fb*1e3:7.2f} ms ({n_rays/t_fb/1e3:7.1f}k r/s)",
          flush=True)


if __name__ == "__main__":
    run("baseline f32")
    run("bfloat16", compute_dtype="bfloat16")
