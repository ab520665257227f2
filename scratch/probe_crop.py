"""Time the sorted-splat epilogue pieces at the 160^3x64 bench shape:
zero-init, crop_acc (folded->grid relayout), normalize, pad_grad_grid.
These are view-count-independent — the suspected ~53 ms fixed cost behind
1-view = 0.56x anchor."""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
import lightplane_tpu as lt
from lightplane_tpu.ops.splatter import _SplatCfg, _normalize_output_grid_size
from lightplane_tpu.ops.kernels import splatter_sorted as ss

res, chn = 160, 64
cfg = _SplatCfg(
    num_samples=96, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5,
    output_grid_sizes=((1, res, res, res, chn),),
    input_grid_sizes=None, n_hidden=(),
)
geos = ss.sorted_geos(cfg)
geo = geos[0]
print("geo:", geo.PZ, geo.PY, geo.PXp, geo.CPAD, "LX", geo.LX,
      "acc MB", geo.PZ * geo.PY * geo.LX * 4 / 2**20)

V = geo.B * geo.gD * geo.gH * geo.gW


def timed(name, fn, *args):
    # fold a scalar reduce into the jit and D2H it each iteration — the
    # axon tunnel pipelines async dispatch, so block_until_ready alone
    # under-reports (PERF_NOTES round 4)
    f = jax.jit(lambda *a: jax.tree_util.tree_map(jnp.sum, fn(*a)))
    float(jax.tree_util.tree_leaves(f(*args))[0])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        float(jax.tree_util.tree_leaves(f(*args))[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
acc = jax.random.uniform(key, (geo.PZ, geo.PY, geo.LX)) + 0.5
gg = jax.random.normal(key, (V, geo.C))

timed("zeros(acc)", lambda: jnp.zeros((geo.PZ, geo.PY, geo.LX)))
timed("crop_acc", lambda a: ss.crop_acc(geo, a), acc)


def crop_norm(a):
    f, w = ss.crop_acc(geo, a)
    return f / jnp.clip(w, 1e-5, None)


timed("crop_acc+normalize", crop_norm, acc)
timed("pad_grad_grid", lambda g: ss.pad_grad_grid(geo, g), gg)
