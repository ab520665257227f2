"""Localize the relu_field g_mlp discrepancy: per-layer grad diffs."""
import dataclasses, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import lightplane_tpu as lt
from lightplane_tpu.ops.mlp_utils import flattened_decoder_params_to_list

sys.path.insert(0, "/root/repo/tests")
from utils import random_rays, random_grid, random_decoder_params

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
chn = 16
dp = random_decoder_params(k3, input_chn=chn, hidden_chn=16,
                           n_layers_trunk=0, use_separate_color_grid=True)
rays = random_rays(k1, 600, 1, encoding_dim=dp.n_hidden_color[0])
grid = random_grid(k2, 1, chn, 8, "triplane", scale=0.5)
cgrid = random_grid(k4, 1, chn, 8, "triplane", scale=0.5)
kw = dict(num_samples=8, gain=1.3, color_grid=cgrid, disparity_at_inf=1e-3)

def loss(impl, mp):
    d = dataclasses.replace(dp, mlp_params=mp)
    out = lt.lightplane_renderer(rays, grid, d, impl=impl, **kw)
    return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out))

g_scan = jax.jit(jax.grad(lambda mp: loss("scan", mp)))(dp.mlp_params)
g_pall = jax.jit(jax.grad(lambda mp: loss("pallas", mp)))(dp.mlp_params)

def unpack(g):
    return flattened_decoder_params_to_list(
        g, dp.n_hidden_trunk, dp.n_hidden_opacity, dp.n_hidden_color)

names = ["w_t", "b_t", "w_o", "b_o", "w_c", "b_c"]
for nm, a, b in zip(names, unpack(g_scan), unpack(g_pall)):
    for l, (x, y) in enumerate(zip(a, b)):
        d = np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))
        s = np.abs(np.asarray(x))
        print(f"{nm}[{l}] shape {x.shape}: max|d| {d.max():.3e} "
              f"mean|d| {d.mean():.3e} max|a| {s.max():.3e} "
              f"mean|a| {s.mean():.3e}")
