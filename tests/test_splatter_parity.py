"""Fused splatter vs naive oracle: forward grids and all gradients.

Mirrors the reference sweep (``tests/test_splatter_with_autograd.py:37-279``):
compare splatted grids, then gradients w.r.t. splatting feature
(rays.encoding), input_grid, and MLP params via a random-projection loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu import (
    lightplane_mlp_splatter,
    lightplane_mlp_splatter_naive,
    lightplane_splatter,
    lightplane_splatter_naive,
)
from .utils import (
    compare_one,
    random_grid,
    random_rays,
    random_splatter_params,
)

BASE = dict(
    n_rays=24,
    batch_size=2,
    num_samples=8,
    num_samples_inf=0,
    mask_out_of_bounds_samples=False,
    contract_coords=False,
    grid_type="voxel",
    resolution=5,
    use_mlp=False,
    out_chn=16,
)

VARIANTS = [
    {},
    {"grid_type": "triplane"},
    {"mask_out_of_bounds_samples": True},
    {"contract_coords": True},
    {"num_samples_inf": 3},
    {"n_rays": 3},
    {"use_mlp": True},
    {"use_mlp": True, "grid_type": "triplane",
     "mask_out_of_bounds_samples": True},
]


def _grid_sizes(cfg):
    B, r, C = cfg["batch_size"], cfg["resolution"], cfg["out_chn"]
    if cfg["grid_type"] == "voxel":
        return [(B, r, r, r, C)]
    return [(B, 1, r, r, C), (B, r, 1, r, C), (B, r, r, 1, C)]


@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_splatter_parity(variant):
    cfg = dict(BASE, **VARIANTS[variant])
    for seed in range(2):
        key = jax.random.PRNGKey(seed)
        k_rays, k_igrid, k_mlp = jax.random.split(key, 3)
        out_sizes = _grid_sizes(cfg)

        if cfg["use_mlp"]:
            enc_dim = 8
            sp = random_splatter_params(
                k_mlp, input_chn=enc_dim, hidden_chn=16,
                out_chn=cfg["out_chn"], n_layers=2,
            )
            input_grid = random_grid(
                k_igrid, cfg["batch_size"], enc_dim, cfg["resolution"],
                cfg["grid_type"], scale=0.5,
            )
        else:
            enc_dim = cfg["out_chn"]
            sp, input_grid = None, None

        rays = random_rays(
            k_rays, cfg["n_rays"], cfg["batch_size"], encoding_dim=enc_dim
        )
        kwargs = dict(
            num_samples=cfg["num_samples"],
            num_samples_inf=cfg["num_samples_inf"],
            mask_out_of_bounds_samples=cfg["mask_out_of_bounds_samples"],
            contract_coords=cfg["contract_coords"],
            return_list=False,
        )

        if cfg["use_mlp"]:
            igrid_flat = jnp.concatenate(
                [g.reshape(-1, g.shape[-1]) for g in input_grid], axis=0
            )
            import numpy as _np
            splits = _np.cumsum(
                [int(_np.prod(g.shape[:-1])) for g in input_grid]
            )[:-1].tolist()

            def run(fn, enc, igf, mlp):
                rays_l = dataclasses.replace(rays, encoding=enc)
                parts = jnp.split(igf, splits, axis=0)
                ig = [p.reshape(g.shape) for p, g in zip(parts, input_grid)]
                return fn(
                    rays_l, out_sizes,
                    dataclasses.replace(sp, mlp_params=mlp), ig, **kwargs,
                )

            args = (rays.encoding, igrid_flat, sp.mlp_params)
            out_naive = run(lightplane_mlp_splatter_naive, *args)
            out_fused = run(lightplane_mlp_splatter, *args)
        else:
            def run(fn, enc):
                rays_l = dataclasses.replace(rays, encoding=enc)
                return fn(rays_l, out_sizes, **kwargs)

            args = (rays.encoding,)
            out_naive = run(lightplane_splatter_naive, *args)
            out_fused = run(lightplane_splatter, *args)

        compare_one(out_naive, out_fused, f"v{variant}/s{seed}/grid")

        proj = jax.random.normal(
            jax.random.PRNGKey(1000 + seed), out_naive.shape
        )

        if cfg["use_mlp"]:
            def loss(fn, enc, igf, mlp):
                return jnp.sum(proj * run(fn, enc, igf, mlp))

            g_naive = jax.grad(
                lambda *a: loss(lightplane_mlp_splatter_naive, *a),
                argnums=(0, 1, 2),
            )(*args)
            g_fused = jax.grad(
                lambda *a: loss(lightplane_mlp_splatter, *a),
                argnums=(0, 1, 2),
            )(*args)
            names = ["enc", "input_grid", "mlp"]
        else:
            def loss(fn, enc):
                return jnp.sum(proj * run(fn, enc))

            g_naive = jax.grad(
                lambda *a: loss(lightplane_splatter_naive, *a)
            )(*args)
            g_fused = jax.grad(
                lambda *a: loss(lightplane_splatter, *a)
            )(*args)
            g_naive, g_fused, names = (g_naive,), (g_fused,), ["enc"]

        for name, a, b in zip(names, g_naive, g_fused):
            compare_one(a, b, f"v{variant}/s{seed}/grad_{name}")
