import jax

jax.config.update("jax_platforms", "cpu")
import dataclasses
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from lightplane_tpu import lightplane_splatter
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from tests.utils import random_rays

rp.INTERPRET = True

out_size = [(1, 1, 36, 44, 16), (1, 36, 1, 44, 16), (1, 36, 44, 1, 16),
            (2, 12, 12, 12, 16)]
chn = 16
rays = random_rays(jax.random.PRNGKey(4), 33, 2, encoding_dim=chn)


def run(impl):
    return lightplane_splatter(
        rays, out_size, num_samples=9, impl=impl, return_list=False)


out_s = jax.jit(lambda: run("scan"))()
out_p = jax.jit(lambda: run("sorted"))()
off = 0
for gs in out_size:
    n = int(np.prod(gs[:-1]))
    a = np.asarray(out_s[off:off + n])
    b = np.asarray(out_p[off:off + n])
    d = np.abs(a - b)
    print(gs, "max", d.max(), "mean", d.mean(), "nbad", (d > 1e-3).sum())
    off += n
