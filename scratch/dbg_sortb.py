import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _SplatCfg, lightplane_splatter_raw
from lightplane_tpu.ops.kernels import splatter_sorted as ss
from tests.test_splatter_sorted import _reconstruct_from_plan, _crop_np

R, gs, ns = 18, (3, 24, 20, 28, 8), 15
rng = np.random.default_rng(0)
origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
d = targets - origins
d /= np.linalg.norm(d, axis=1, keepdims=True)
enc = rng.normal(size=(R, gs[4])).astype(np.float32)
gidx = rng.integers(0, gs[0], size=(R,)).astype(np.int32)

cfg = _SplatCfg(
    num_samples=ns, num_samples_inf=0,
    mask_out_of_bounds_samples=False, contract_coords=False,
    disparity_at_inf=1e-5, output_grid_sizes=(gs,),
    input_grid_sizes=None, n_hidden=(),
)
geom = (
    jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
    jnp.full((R,), 3.0), jnp.asarray(gidx), jnp.ones((R,), jnp.float32),
)
(geo,) = ss.sorted_geos(cfg)
print("geo:", geo)
plan = jax.jit(lambda g: ss.sorted_plan(cfg, geo, g))(geom)
plan = {k: np.asarray(v) for k, v in plan.items()}
feat_aug = np.concatenate([enc, np.ones((R, 1), np.float32)], axis=1)
grid = _reconstruct_from_plan(geo, plan, feat_aug)
feat_np, w_np = _crop_np(geo, grid)

rays = Rays(jnp.asarray(d), jnp.asarray(origins), jnp.asarray(gidx),
            jnp.full((R,), 0.1), jnp.full((R,), 3.0), jnp.asarray(enc))
f_ref, w_ref = jax.jit(lambda: lightplane_splatter_raw(
    rays, [gs], num_samples=ns, impl="naive"))()
f_ref = np.asarray(f_ref)
w_ref = np.asarray(w_ref)

diff = np.abs(feat_np - f_ref).max(axis=1).reshape(gs[0], gs[1], gs[2], gs[3])
bad = np.argwhere(diff > 2e-4)
print("bad cells (b,d,h,w):")
print(bad[:20])
print("counts per b:", [int((bad[:, 0] == b).sum()) for b in range(gs[0])])
print("d values:", np.unique(bad[:, 1]), "h:", np.unique(bad[:, 2]),
      "w:", np.unique(bad[:, 3]))
