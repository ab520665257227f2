import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _SplatCfg
from lightplane_tpu.ops.kernels import splatter_sorted as ss

rng = np.random.default_rng(0)
R, S = 16, 33
gs = (1, 48, 40, 56, 8)
origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
d = targets - origins
d /= np.linalg.norm(d, axis=1, keepdims=True)
enc = rng.normal(size=(R, 8)).astype(np.float32)

cfg = _SplatCfg(
    num_samples=S, num_samples_inf=0, mask_out_of_bounds_samples=True,
    contract_coords=False, disparity_at_inf=1e-5,
    output_grid_sizes=(gs,), input_grid_sizes=None, n_hidden=(),
)
valid = jnp.ones((R,), jnp.float32)
geom = (jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
        jnp.full((R,), 3.0), jnp.zeros((R,), jnp.int32), valid)

geo = ss.sorted_geo(cfg)
print("geo:", geo)
plan = jax.jit(lambda g: ss.sorted_plan(cfg, g))(geom)
plan = {k: np.asarray(v) for k, v in plan.items()}

fzT, fyT, fxT = plan["fzT"], plan["fyT"], plan["fxT"]
table, ray_pad = plan["table"], plan["ray_pad"]
ngc = fzT.shape[0] // ss.BIN
print("n_groups_cap:", ngc, "Npad:", ray_pad.shape)

# reconstruct padded grid in numpy, mimicking the kernel exactly
C1 = geo.C1
feat_aug = np.concatenate([enc, np.ones((R, 1), np.float32)], axis=1)
grid = np.zeros((geo.PZ, geo.PY, geo.PXp, C1), np.float32)
WZ, WY, WX = ss.WZ, ss.WY, ss.WX
for g in range(ngc):
    bz, by = table[g, 0], table[g, 1]
    for q in range(ss.GBINS):
        dz = table[g, 4 + q]
        dy = table[g, 4 + ss.GBINS + q]
        dx = table[g, 4 + 2 * ss.GBINS + q]
        fz = fzT[g * ss.BIN:(g + 1) * ss.BIN, q]
        fy = fyT[g * ss.BIN:(g + 1) * ss.BIN, q]
        fx = fxT[g * ss.BIN:(g + 1) * ss.BIN, q]
        rays_q = ray_pad[(g * ss.GBINS + q) * ss.BIN:(g * ss.GBINS + q + 1) * ss.BIN]
        az0, ay0, ax0 = bz + dz, by + dy, dx
        zz = np.arange(WZ)[None, :, None, None] + az0
        yy = np.arange(WY)[None, None, :, None] + ay0
        xx = np.arange(WX)[None, None, None, :] + ax0
        hz = np.maximum(0, 1 - np.abs(zz - fz[:, None, None, None]))
        hy = np.maximum(0, 1 - np.abs(yy - fy[:, None, None, None]))
        hx = np.maximum(0, 1 - np.abs(xx - fx[:, None, None, None]))
        w = (hz * hy * hx).reshape(ss.BIN, -1)        # [BIN, WCELLS]
        upd = w.T @ feat_aug[rays_q]                  # [WCELLS, C1]
        grid[az0:az0 + WZ, ay0:ay0 + WY, ax0:ax0 + WX, :] += (
            upd.reshape(WZ, WY, WX, C1)
        )

core = grid[: geo.D, : geo.H, : geo.W]
feat_np = core[..., :8].reshape(-1, 8)
w_np = core[..., 8:].reshape(-1, 1)

# oracle
from lightplane_tpu.ops.splatter import lightplane_splatter_raw

rays = Rays(jnp.asarray(d), jnp.asarray(origins), jnp.zeros((R,), jnp.int32),
            jnp.full((R,), 0.1), jnp.full((R,), 3.0), jnp.asarray(enc))
f_ref, w_ref = jax.jit(lambda: lightplane_splatter_raw(
    rays, [gs], num_samples=S, mask_out_of_bounds_samples=True, impl="naive"))()
f_ref, w_ref = np.asarray(f_ref), np.asarray(w_ref)
print("plan-reconstruction vs oracle:")
print("  feat max|d|", np.abs(feat_np - f_ref).max(),
      "w max|d|", np.abs(w_np - w_ref).max())

# also check for slot coverage: every (ray, sample) exactly once with hat sum
print("slot count vs N:", (ray_pad >= 0).shape, "N =", R * S)
