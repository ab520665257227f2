"""Shared test fixtures and comparison helpers.

Mirrors the reference's test strategy (``tests/utils.py:185-587``): synthetic
random rays/grids/decoders, and the same tolerance comparator.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu import (
    DecoderParams,
    Rays,
    SplatterParams,
    init_decoder_params,
    init_splatter_params,
)

# Reference tolerances (tests/utils.py:191-193)
MAX_DIFF = 0.1
MEAN_DIFF = 2e-3
MEAN_REL_DIFF = 7e-4


def compare_one(x, y, name: str = "", max_diff=MAX_DIFF, mean_diff=MEAN_DIFF,
                mean_rel_diff=MEAN_REL_DIFF, *, magnitude_scaled=False):
    """Assert |x - y| within the reference's absolute/mean/relative bounds
    (``tests/utils.py:185-221``) — the reference's EXACT bounds by default
    (max 0.1, mean 2e-3, mean-rel 7e-4; no scaling, no slack factor).

    ``magnitude_scaled=True`` is an explicit, per-site opt-in for
    ill-conditioned configs whose outputs are far from O(1) — disparity
    background samples produce nlt ~1e3 and MLP grads ~1e5, where an f32
    implementation cannot meet a 0.1 absolute bound against *itself re-run
    in a different association order* (measured: the pure scan path in f32
    deviates from an f64 oracle by max ~1.1 on grads of magnitude 1.6e5
    for the masked_inf_noise fixture).  It scales the two absolute bounds
    by the data magnitude; call sites using it must say why.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    assert x.shape == y.shape, f"{name}: shape {x.shape} vs {y.shape}"
    assert np.isfinite(x).all(), f"{name}: non-finite lhs"
    assert np.isfinite(y).all(), f"{name}: non-finite rhs"
    adiff = np.abs(x - y)
    denom = 0.5 * (np.abs(x) + np.abs(y)) + 1e-4
    rel = adiff / denom
    max_scale = mean_scale = 1.0
    if magnitude_scaled and x.size:
        max_scale = max(1.0, float(np.abs(x).max()))
        mean_scale = max(1.0, float(np.abs(x).mean()))
    assert adiff.max() <= max_diff * max_scale, (
        f"{name}: max abs diff {adiff.max():.2e} > {max_diff}*{max_scale:.1e}"
    )
    assert adiff.mean() <= mean_diff * mean_scale, (
        f"{name}: mean abs diff {adiff.mean():.2e} >"
        f" {mean_diff}*{mean_scale:.1e}"
    )
    assert rel.mean() <= mean_rel_diff, (
        f"{name}: mean rel diff {rel.mean():.2e} > {mean_rel_diff:.1e}"
    )


def random_rays(
    key: jax.Array,
    n_rays: int,
    batch_size: int = 1,
    encoding_dim: Optional[int] = None,
    identical: bool = False,
) -> Rays:
    """Random rays aimed from a shell toward the origin, near~0.1 far~3
    (reference ``tests/utils.py:230-268``)."""
    ks = jax.random.split(key, 5)
    origins = jax.random.normal(ks[0], (n_rays, 3)) / 3.0 + jnp.array(
        [0.0, 0.0, -2.0]
    )
    targets = jax.random.normal(ks[1], (n_rays, 3)) * 0.2
    directions = targets - origins
    near = jnp.full((n_rays,), 0.1) + 0.05 * jax.random.uniform(
        ks[2], (n_rays,)
    )
    far = jnp.full((n_rays,), 3.0) + 0.2 * jax.random.uniform(ks[3], (n_rays,))
    grid_idx = jax.random.randint(ks[4], (n_rays,), 0, batch_size)
    if identical:
        origins = jnp.broadcast_to(origins[:1], origins.shape)
        directions = jnp.broadcast_to(directions[:1], directions.shape)
    encoding = None
    if encoding_dim is not None:
        encoding = (
            jax.random.normal(ks[0], (n_rays, encoding_dim)) * 0.1
        )
    return Rays(
        directions=directions,
        origins=origins,
        grid_idx=grid_idx,
        near=near,
        far=far,
        encoding=encoding,
    )


def random_grid(
    key: jax.Array,
    batch_size: int,
    channels: int,
    resolution: int = 8,
    grid_type: str = "voxel",
    scale: float = 0.1,
) -> List[jnp.ndarray]:
    """Random voxel grid or triplane grid-list
    (reference ``tests/utils.py:283-324``)."""
    D = H = W = resolution
    if grid_type == "voxel":
        shapes = [(batch_size, D, H, W, channels)]
    elif grid_type == "triplane":
        shapes = [
            (batch_size, 1, H, W, channels),
            (batch_size, D, 1, W, channels),
            (batch_size, D, H, 1, channels),
        ]
    elif grid_type == "mixed":
        shapes = [
            (batch_size, D, H, W, channels),
            (batch_size, 1, H, W, channels),
        ]
    else:
        raise ValueError(grid_type)
    keys = jax.random.split(key, len(shapes))
    return [
        jax.random.normal(k, s) * scale for k, s in zip(keys, shapes)
    ]


def random_decoder_params(
    key: jax.Array,
    input_chn: int = 16,
    hidden_chn: int = 16,
    color_chn: int = 3,
    n_layers_trunk: int = 2,
    n_layers_opacity: int = 2,
    n_layers_color: int = 2,
    use_separate_color_grid: bool = False,
) -> DecoderParams:
    dp = init_decoder_params(
        key,
        n_layers_opacity=n_layers_opacity,
        n_layers_trunk=n_layers_trunk,
        n_layers_color=n_layers_color,
        input_chn=input_chn,
        hidden_chn=hidden_chn,
        color_chn=color_chn,
        opacity_init_bias=-1.0,
        use_separate_color_grid=use_separate_color_grid,
    )
    # Small N(0, 0.05) weights as in the reference fixtures
    # (tests/utils.py:327-376 uses N(0, 0.01)): keeps opacities moderate so
    # the ill-conditioned disparity-background depth terms (t ~ 1/disparity)
    # don't amplify f32 roundoff past the parity tolerances.
    return dataclasses.replace(
        dp,
        mlp_params=0.05 * jax.random.normal(key, dp.mlp_params.shape),
    )


def random_splatter_params(
    key: jax.Array,
    input_chn: int = 16,
    hidden_chn: int = 16,
    out_chn: int = 16,
    n_layers: int = 2,
) -> SplatterParams:
    return init_splatter_params(
        key,
        n_layers=n_layers,
        input_chn=input_chn,
        hidden_chn=hidden_chn,
        out_chn=out_chn,
    )
