"""Dump the optimized HLO of the render-only memory step (batch 2) and
rank the largest tensor shapes appearing in it."""
import collections
import os
import re
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jaxcomp")
)
os.environ["LIGHTPLANE_W3_NO_FALLBACK"] = "1"
sys.path.insert(0, "/root/repo")

import importlib
mb = importlib.import_module("scratch.mem_breakdown") if False else None

# reuse mem_breakdown's builders by exec'ing it with a guard
import numpy as np
import jax
import jax.numpy as jnp
import lightplane_tpu as lt
import dataclasses
from lightplane_tpu.ops import splatter as _sp
from lightplane_tpu.utils.cameras import pixel_ray_directions, sphere_cameras

_sp._SORTED_CHUNK_SAMPLES = 1_048_576
_sp._PLAN_RESID_BUDGET = 0

SIZE, CHN, RES, HIDDEN = 512, 32, 128, 32
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
n_img = 2
cams = jnp.asarray(sphere_cameras(n_img, radius=2.5, elevation_deg=25.0))
dirs_cam = jnp.asarray(
    pixel_ray_directions(SIZE, SIZE, SIZE * 1.1).reshape(-1, 3))
base = np.arange(n_img)[:, None] * (SIZE * SIZE)
full_order = jnp.asarray((base + np.asarray(order)[None]).ravel())
R = n_img * SIZE * SIZE


def step_loss(enc_chw, mlp_params):
    dirs = jnp.einsum("rk,nmk->nrm", dirs_cam, cams[:, :3, :3]).reshape(R, 3)
    origins = jnp.broadcast_to(
        cams[:, None, :3, 3], (n_img, SIZE * SIZE, 3)).reshape(R, 3)
    enc = jnp.transpose(enc_chw, (0, 2, 3, 1)).reshape(R, CHN)
    r = lt.Rays(
        directions=dirs[full_order],
        origins=origins[full_order],
        grid_idx=jnp.zeros((R,), jnp.int32),
        near=jnp.full((R,), 0.5),
        far=jnp.full((R,), 3.5),
        encoding=enc[full_order],
    )
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


enc_chw = jax.random.normal(jax.random.PRNGKey(1), (n_img, CHN, SIZE, SIZE)) * 0.1
c = jax.jit(jax.grad(step_loss, argnums=(0, 1))).lower(
    enc_chw, dp5.mlp_params).compile()
txt = c.as_text()
open("/tmp/render_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt))

# rank shapes by byte size x occurrence on allocation-looking lines
DT = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "pred": 1,
      "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8}
pat = re.compile(r"(\w+)\[([0-9,]*)\]")
sizes = collections.Counter()
for m in pat.finditer(txt):
    dt, dims = m.group(1), m.group(2)
    if dt not in DT:
        continue
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    b = n * DT[dt]
    if b >= 32 * 2**20:
        sizes[f"{dt}[{dims}]"] += 1
for shape, cnt in sizes.most_common(30):
    dt = shape.split("[")[0]
    dims = shape[shape.index("[") + 1:-1]
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    print(f"{shape:40s} x{cnt:3d}  {n * DT[dt] / 2**20:8.1f} MB each")
