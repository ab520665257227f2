"""Grid-list regularizers, up-sampling, and initialization.

Counterpart of reference ``examples/utils/util/grid_util.py:15-189`` —
promoted into the framework since TV/L1 regularization and coarse-to-fine
up-sampling are core to fitting workflows.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_3d_representation(
    key: jax.Array,
    representation: str,
    resolution: int,
    channels: int,
    batch_size: int = 1,
    init_scale: float = 0.1,
) -> List[jnp.ndarray]:
    """Create a randomly initialized grid-list: ``"voxel_grid"`` or
    ``"triplane"`` (reference ``grid_util.py:15-40``)."""
    r = resolution
    if representation == "voxel_grid":
        shapes = [(batch_size, r, r, r, channels)]
    elif representation == "triplane":
        shapes = [
            (batch_size, 1, r, r, channels),
            (batch_size, r, 1, r, channels),
            (batch_size, r, r, 1, channels),
        ]
    else:
        raise ValueError(f"unknown representation {representation!r}")
    keys = jax.random.split(key, len(shapes))
    return [
        jax.random.normal(k, s) * init_scale for k, s in zip(keys, shapes)
    ]


def _tv_one(g: jnp.ndarray) -> jnp.ndarray:
    """Mean squared forward-difference over the non-singleton spatial dims."""
    total = 0.0
    n_terms = 0
    for axis in (1, 2, 3):
        if g.shape[axis] > 1:
            d = jnp.diff(g, axis=axis)
            total = total + jnp.mean(d**2)
            n_terms += 1
    return total / max(n_terms, 1)


def grid_tv_loss(grid: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Total-variation regularizer over a grid-list (reference
    ``grid_util.py:155-165``)."""
    return sum(_tv_one(g) for g in grid) / len(grid)


def grid_l1_loss(grid: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Mean absolute value of the grid features (reference
    ``grid_util.py:168-178``)."""
    return sum(jnp.mean(jnp.abs(g)) for g in grid) / len(grid)


def grid_up_sample(
    grid: Sequence[jnp.ndarray], factor: int = 2
) -> List[jnp.ndarray]:
    """Trilinear/bilinear up-sampling of each grid in the list by ``factor``
    along its non-singleton spatial dims (coarse-to-fine fitting; reference
    ``grid_util.py:114-189``)."""
    out = []
    for g in grid:
        B, D, H, W, C = g.shape
        new_shape = (
            B,
            D * factor if D > 1 else 1,
            H * factor if H > 1 else 1,
            W * factor if W > 1 else 1,
            C,
        )
        out.append(
            jax.image.resize(g, new_shape, method="linear")
        )
    return out


# aliases mirroring the reference naming
grid_TV_loss = grid_tv_loss
grid_L1_loss = grid_l1_loss
