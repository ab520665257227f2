import os; os.environ["JAX_PLATFORMS"]="cpu"
import jax, jax.numpy as jnp, numpy as np
import sys; sys.path.insert(0, "/root/repo")
from lightplane_tpu.ops.naive_renderer import _ray_depths_and_deltas, _depth_inv_sphere
from lightplane_tpu.ops.renderer import _step_depth_delta, _RenderCfg
from lightplane_tpu.ops.rays import Rays

ns, ni = 10, 4
near = jnp.array([0.1, 0.2]); far = jnp.array([3.0, 2.5])
rays = Rays(jnp.zeros((2,3)), jnp.zeros((2,3)), jnp.zeros(2,dtype=jnp.int32), near, far)
depths, delta = _ray_depths_and_deltas(rays, ns, ni, 1e-5)
cfg = _RenderCfg(ns, ni, 1.0, False, False, 1e-5, 0.0, (), None, (), (), (), False, None, 2)
for s in range(ns+ni):
    t, d = _step_depth_delta(cfg, near, far, jnp.asarray(s))
    print(s, np.asarray(t) - np.asarray(depths[:, s]), np.asarray(d) - np.asarray(delta[:, s]))
