"""Locate the per-image memory tax in the 512^2 splat+render bench.

Compiles sub-pipelines at batch 2 and 4 and prints marginal MB/image for
each: rays-only, splat-only, render-only, full.  Mirrors bench.py
main_memory knobs exactly.
"""
import dataclasses
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
os.environ["LIGHTPLANE_W3_NO_FALLBACK"] = "1"

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import lightplane_tpu as lt
from lightplane_tpu.ops import splatter as _sp
from lightplane_tpu.utils.cameras import pixel_ray_directions, sphere_cameras
from benchmarks.renderer_speed import analysis_mem_mb

_sp._SORTED_CHUNK_SAMPLES = 1_048_576
_sp._PLAN_RESID_BUDGET = 0

SIZE = 512
CHN = 32
RES = 128
HIDDEN = 32
OUT_SIZES = (
    (1, 1, RES, RES, CHN),
    (1, RES, 1, RES, CHN),
    (1, RES, RES, 1, CHN),
)
dp5 = lt.init_decoder_params(
    jax.random.PRNGKey(2), n_layers_opacity=2, n_layers_trunk=2,
    n_layers_color=2, input_chn=CHN, hidden_chn=HIDDEN,
    color_chn=3, opacity_init_bias=-2.0,
)
from lightplane_tpu.ops.kernels.renderer_w3 import W3_TILE
order, _ = lt.tile_ray_order(SIZE, SIZE, tile=W3_TILE)


def make_step(mode):
    def step_loss(enc_chw, mlp_params, cams, full_order, dirs_cam, n_img):
        R = n_img * SIZE * SIZE
        dirs = jnp.einsum("rk,nmk->nrm", dirs_cam, cams[:, :3, :3]).reshape(R, 3)
        origins = jnp.broadcast_to(
            cams[:, None, :3, 3], (n_img, SIZE * SIZE, 3)
        ).reshape(R, 3)
        enc = jnp.transpose(enc_chw, (0, 2, 3, 1)).reshape(R, CHN)
        r = lt.Rays(
            directions=dirs[full_order],
            origins=origins[full_order],
            grid_idx=jnp.zeros((R,), jnp.int32),
            near=jnp.full((R,), 0.5),
            far=jnp.full((R,), 3.5),
            encoding=enc[full_order],
        )
        if mode == "rays":
            return (jnp.sum(r.directions) + jnp.sum(r.origins)
                    + jnp.sum(r.encoding))
        if mode in ("splat", "full"):
            lifted = lt.lightplane_splatter(
                r, OUT_SIZES, num_samples=96, return_list=True,
            )
            if mode == "splat":
                return sum(jnp.sum(g ** 2) for g in lifted)
        else:  # render-only: fixed random triplane instead of lifted
            lifted = [
                jax.random.normal(jax.random.PRNGKey(7 + i), s) * 0.1
                for i, s in enumerate(OUT_SIZES)
            ]
        d = dataclasses.replace(dp5, mlp_params=mlp_params)
        r2 = dataclasses.replace(r, encoding=jnp.zeros((R, HIDDEN)))
        depth, nlt, feat = lt.lightplane_renderer(
            r2, lifted, d, num_samples=256, gain=1.0
        )
        return jnp.sum(feat ** 2) + jnp.sum(nlt) + jnp.sum(depth)
    return step_loss


def peak_for(mode, n_img):
    cams = jnp.asarray(sphere_cameras(n_img, radius=2.5, elevation_deg=25.0))
    dirs_cam = jnp.asarray(
        pixel_ray_directions(SIZE, SIZE, SIZE * 1.1).reshape(-1, 3))
    base = np.arange(n_img)[:, None] * (SIZE * SIZE)
    full_order = jnp.asarray((base + np.asarray(order)[None]).ravel())
    step = make_step(mode)
    fn = jax.jit(
        jax.grad(step, argnums=(0, 1)), static_argnums=(5,)
    )
    enc_chw = jax.random.normal(
        jax.random.PRNGKey(1), (n_img, CHN, SIZE, SIZE)) * 0.1
    c = fn.lower(enc_chw, dp5.mlp_params, cams, full_order, dirs_cam,
                 n_img).compile()
    ma = c.memory_analysis()
    return (analysis_mem_mb(c), ma.temp_size_in_bytes / 2**20,
            ma.argument_size_in_bytes / 2**20,
            ma.output_size_in_bytes / 2**20)


modes = sys.argv[1:] or ["rays", "splat", "render", "full"]
for mode in modes:
    t2 = peak_for(mode, 2)
    t4 = peak_for(mode, 4)
    marg = [(a - b) / 2.0 for a, b in zip(t4, t2)]
    print(f"{mode:7s} marginal/img: total {marg[0]:8.1f} MB  "
          f"temp {marg[1]:8.1f}  arg {marg[2]:6.1f}  out {marg[3]:6.1f}  "
          f"(b2 total {t2[0]:8.1f}, b4 total {t4[0]:8.1f})", flush=True)
