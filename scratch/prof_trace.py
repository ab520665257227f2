import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import lightplane_tpu as lt
import bench

rays, grid, dp = bench.make_inputs(jax.random.PRNGKey(0))
def loss(grid, mlp_params, encoding):
    r = dataclasses.replace(rays, encoding=encoding)
    d = dataclasses.replace(dp, mlp_params=mlp_params)
    depth, nlt, feat = lt.lightplane_renderer(r, grid, d, num_samples=bench.NUM_SAMPLES, gain=1.0)
    return jnp.sum(feat) + jnp.sum(depth) + jnp.sum(nlt)
f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
args = (grid, dp.mlp_params, rays.encoding)
jax.block_until_ready(f(*args))
with jax.profiler.trace("/tmp/lp_trace"):
    jax.block_until_ready(f(*args))
    jax.block_until_ready(f(*args))
print("done")
