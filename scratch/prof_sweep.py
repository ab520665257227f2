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


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


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
    for wf in (4, 16):
        rp.WINDOW_FRACTION = wf
        run(f"WINDOW_FRACTION={wf}")
    rp.WINDOW_FRACTION = 8
    for mc, mcb in ((16, 16), (4, 4)):
        rp.MARCH_CHUNK = mc
        rp.MARCH_CHUNK_BW_WIN = mcb
        run(f"MARCH_CHUNK={mc}/{mcb}")
    rp.MARCH_CHUNK = 8
    rp.MARCH_CHUNK_BW_WIN = 8
    for rb in (256, 1024):
        rp.RAY_BLOCK = rb
        run(f"RAY_BLOCK={rb}")
