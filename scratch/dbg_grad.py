import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax
jax.config.update("jax_enable_x64", False)
import jax.numpy as jnp, numpy as np, dataclasses, sys
sys.path.insert(0, "/root/repo")
import lightplane_tpu as lt
from tests.utils import random_rays, random_grid, random_decoder_params

key = jax.random.PRNGKey(0)
k1,k2,k3,kp = jax.random.split(key,4)
dp = random_decoder_params(k3, input_chn=8, hidden_chn=8)
rays = random_rays(k1, 8, 1, encoding_dim=dp.n_hidden_color[0])
grid = random_grid(k2, 1, 8, 4, "voxel", scale=0.5)
kw = dict(num_samples=6, num_samples_inf=4, gain=1.0)
projs = [jax.random.normal(k, s) for k, s in zip(jax.random.split(kp,3), [(8,),(8,),(8,3)])]

def loss(fn, g):
    out = fn(rays, [g], dp, **kw)
    return sum(jnp.sum(p*o) for p,o in zip(projs,out))

gn = jax.jit(jax.grad(lambda g: loss(lt.lightplane_renderer_naive, g)))(grid[0])
gf = jax.jit(jax.grad(lambda g: loss(lt.lightplane_renderer, g)))(grid[0])
d = np.abs(np.asarray(gn)-np.asarray(gf))
print("f32 naive vs fused: max", d.max(), "mean", d.mean(), "scale", np.abs(np.asarray(gn)).max())
# per-step contribution check: which steps dominate? try ni=0 to confirm clean
kw0 = dict(num_samples=6, num_samples_inf=0, gain=1.0)
def loss0(fn, g):
    out = fn(rays, [g], dp, **kw0)
    return sum(jnp.sum(p*o) for p,o in zip(projs,out))
gn0 = jax.jit(jax.grad(lambda g: loss0(lt.lightplane_renderer_naive, g)))(grid[0])
gf0 = jax.jit(jax.grad(lambda g: loss0(lt.lightplane_renderer, g)))(grid[0])
d0 = np.abs(np.asarray(gn0)-np.asarray(gf0))
print("ni=0: max", d0.max(), "mean", d0.mean())
# now large disparity_at_inf (smaller depths) to test conditioning hypothesis
kw2 = dict(num_samples=6, num_samples_inf=4, gain=1.0, disparity_at_inf=0.3)
def loss2(fn, g):
    out = fn(rays, [g], dp, **kw2)
    return sum(jnp.sum(p*o) for p,o in zip(projs,out))
gn2 = jax.jit(jax.grad(lambda g: loss2(lt.lightplane_renderer_naive, g)))(grid[0])
gf2 = jax.jit(jax.grad(lambda g: loss2(lt.lightplane_renderer, g)))(grid[0])
d2 = np.abs(np.asarray(gn2)-np.asarray(gf2))
print("disp=0.3: max", d2.max(), "mean", d2.mean())
