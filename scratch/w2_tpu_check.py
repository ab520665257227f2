"""On-chip W2 parity: pallas (packed 2D-window path) vs scan at
bench-like shapes, values and grads."""
import dataclasses, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp

IM = 64          # 64x64 rays, tiled 8x32
NS = 256
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
dp = lt.init_decoder_params(
    k1, n_layers_opacity=2, n_layers_trunk=2, n_layers_color=2,
    input_chn=32, hidden_chn=32, color_chn=3, opacity_init_bias=-2.0)
grid = [
    jax.random.normal(k2, (1, 1, 32, 32, 32)) * 0.1,
    jax.random.normal(k3, (1, 32, 1, 32, 32)) * 0.1,
    jax.random.normal(k4, (1, 32, 32, 1, 32)) * 0.1,
]
n = IM * IM
ys, xs = jnp.meshgrid(jnp.linspace(-0.5, 0.5, IM), jnp.linspace(-0.5, 0.5, IM), indexing="ij")
dirs = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], -1)
order, _ = lt.tile_ray_order(IM, IM)
rays = lt.Rays(
    directions=dirs[order],
    origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
    grid_idx=jnp.zeros((n,), jnp.int32),
    near=jnp.full((n,), 1.0), far=jnp.full((n,), 3.0),
    encoding=jax.random.normal(k5, (n, 32)) * 0.1)

def loss(impl, g, mp, enc):
    r = dataclasses.replace(rays, encoding=enc)
    d = dataclasses.replace(dp, mlp_params=mp)
    out = lt.lightplane_renderer(r, g, d, num_samples=NS, gain=1.0, impl=impl)
    return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

res = {}
for impl in ("scan", "pallas"):
    f = jax.jit(jax.value_and_grad(
        lambda g, mp, enc: loss(impl, g, mp, enc), argnums=(0, 1, 2),
        has_aux=True))
    (l, out), grads = f(grid, dp.mlp_params, rays.encoding)
    res[impl] = jax.tree_util.tree_map(np.asarray, (out, grads))

ok = True
names = ["depth", "nlt", "feat", "g_grid0", "g_grid1", "g_grid2", "g_mlp", "g_enc"]
for nm, a, b in zip(names, jax.tree_util.tree_leaves(res["scan"]),
                    jax.tree_util.tree_leaves(res["pallas"])):
    d = np.abs(a - b)
    mrel = d.mean() / (np.abs(a).mean() + 1e-8)
    good = d.max() < 0.1 and d.mean() < 2e-3 and mrel < 2e-3
    ok &= good
    print(f"  {nm:8s} max={d.max():.3e} mean={d.mean():.3e} mrel={mrel:.3e} "
          f"{'OK' if good else 'BAD'}", flush=True)
print("PASS w2-on-chip" if ok else "FAIL w2-on-chip")
