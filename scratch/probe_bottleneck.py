"""Probe what bounds the fw kernel: grid cells (stencil width), channels
(matmul N), ray block size."""
import dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import lightplane_tpu as lt
import lightplane_tpu.ops.kernels.renderer_pallas as rp

IMAGE = 256
SAMPLES = 256


def bench(res, chn, ray_block, hidden=32):
    rp.RAY_BLOCK = ray_block
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dp = lt.init_decoder_params(
        k1, n_layers_opacity=2, n_layers_trunk=2, n_layers_color=2,
        input_chn=chn, hidden_chn=hidden, color_chn=3,
        opacity_init_bias=-2.0)
    grid = [
        jax.random.normal(k2, (1, 1, res, res, chn)) * 0.1,
        jax.random.normal(k3, (1, res, 1, res, chn)) * 0.1,
        jax.random.normal(k4, (1, res, res, 1, chn)) * 0.1,
    ]
    n = IMAGE * IMAGE
    ys, xs = jnp.meshgrid(jnp.linspace(-0.5, 0.5, IMAGE),
                          jnp.linspace(-0.5, 0.5, IMAGE), indexing="ij")
    rays = lt.Rays(
        directions=jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], -1),
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.0), far=jnp.full((n,), 3.0),
        encoding=jax.random.normal(k5, (n, hidden)) * 0.1)

    f = jax.jit(lambda g, mp, enc: sum(jnp.sum(o) for o in
        lt.lightplane_renderer(
            dataclasses.replace(rays, encoding=enc), g,
            dataclasses.replace(dp, mlp_params=mp),
            num_samples=SAMPLES, gain=1.0, impl="pallas")))
    args = (grid, dp.mlp_params, rays.encoding)
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter(); k = 5
    for _ in range(k):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / k
    print(f"res={res} chn={chn} block={ray_block}: fw {dt*1e3:7.1f} ms")


for cfg in sys.argv[1:]:
    res, chn, blk = map(int, cfg.split(","))
    bench(res, chn, blk)
