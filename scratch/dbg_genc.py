import dataclasses, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import lightplane_tpu as lt
sys.path.insert(0, "/root/repo/tests")
from utils import random_rays, random_grid, random_decoder_params

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
dp = random_decoder_params(k3, input_chn=16, hidden_chn=16, n_layers_trunk=2)
rays = random_rays(k1, 512, 1, encoding_dim=dp.n_hidden_color[0])
grid = random_grid(k2, 1, 16, 8, "triplane", scale=0.5)
NS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
kw = dict(num_samples=NS, gain=1.3)

def loss(impl, enc):
    r = dataclasses.replace(rays, encoding=enc)
    out = lt.lightplane_renderer(r, grid, dp, impl=impl, **kw)
    return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out))

g_scan = jax.jit(jax.grad(lambda e: loss("scan", e)))(rays.encoding)
g_pall = jax.jit(jax.grad(lambda e: loss("pallas", e)))(rays.encoding)
a, b = np.asarray(g_scan), np.asarray(g_pall)
d = np.abs(a - b)
print(f"NS={NS} max diff {d.max():.3e}  scale {np.abs(a).max():.3e}")
i = np.unravel_index(d.argmax(), d.shape)
print("worst elem scan", a[i], "pallas", b[i], "at", i)
# column profile of diffs
print("mean |diff| per channel:", d.mean(0)[:8])
print("mean |scan| per channel:", np.abs(a).mean(0)[:8])
