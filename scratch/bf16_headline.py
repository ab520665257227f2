"""Headline bench with compute_dtype=bfloat16: perf + error vs f32."""
import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import lightplane_tpu as lt
import bench

rays, grid, dp = bench.make_inputs(jax.random.PRNGKey(0))
n_rays = rays.directions.shape[0]


def make_loss(cdt):
    def loss(grid, mlp_params, encoding):
        r = dataclasses.replace(rays, encoding=encoding)
        d = dataclasses.replace(dp, mlp_params=mlp_params)
        depth, nlt, feat = lt.lightplane_renderer(
            r, grid, d, num_samples=bench.NUM_SAMPLES, gain=1.0,
            compute_dtype=cdt)
        return jnp.sum(feat) + jnp.sum(depth) + jnp.sum(nlt), (depth, nlt, feat)
    return loss


for cdt in ("float32", "bfloat16"):
    loss = make_loss(cdt)
    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2), has_aux=True))
    args = (grid, dp.mlp_params, rays.encoding)
    (gg, gm, ge), (depth, nlt, feat) = jax.block_until_ready(f(*args))
    t0 = time.perf_counter(); k = 5
    for _ in range(k):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / k
    print(f"{cdt}: {dt*1e3:7.1f} ms  {n_rays/dt/1e3:6.0f}k rays/s", flush=True)
    if cdt == "float32":
        ref = (depth, nlt, feat, gm, ge, *gg)
    else:
        cur = (depth, nlt, feat, gm, ge, *gg)
        for name, a, b in zip(
            ("depth", "nlt", "feat", "gmlp", "genc", "g0", "g1", "g2"),
            ref, cur,
        ):
            a, b = np.asarray(a), np.asarray(b)
            d = np.abs(a - b)
            denom = np.abs(a).mean() + 1e-8
            print(f"  {name:6s} max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
                  f"meanrel={d.mean()/denom:.3e}")
