"""Grid-list utilities: flatten/unflatten, shape checks, padding.

A "grid-list" is a list of 5-D feature grids ``[B, D_i, H_i, W_i, C]`` (voxel
grids have all of D/H/W > 1; triplanes are three grids with one singleton
spatial dim each).  The fused paths consume a single flattened 2-D tensor
``[sum_i B*D_i*H_i*W_i, C]`` plus *static* per-grid shapes.

Behavioral reference: ``lightplane/misc_utils.py:25-234``.  TPU-first change:
grid sizes are static Python tuples (trace-time constants) rather than device
tensors — each grid-list shape specializes the compiled kernel, which is both
simpler and faster on XLA (SURVEY.md §7 "hard parts" #4).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

GridList = Sequence[jnp.ndarray]
GridSizes = Tuple[Tuple[int, int, int, int, int], ...]


def assert_shape(x, shape):
    assert tuple(x.shape) == tuple(shape), (
        f"expected shape {tuple(shape)}, got {tuple(x.shape)}"
    )


def flatten_grid(grid: GridList) -> Tuple[jnp.ndarray, GridSizes]:
    """Flatten a grid-list into one 2-D ``[V_total, C]`` tensor + static sizes."""
    grid_sizes = tuple(tuple(int(s) for s in g.shape) for g in grid)
    grid_flat = jnp.concatenate(
        [g.reshape(-1, g.shape[-1]) for g in grid], axis=0
    )
    return grid_flat, grid_sizes


def unflatten_grid(
    grid: jnp.ndarray, grid_sizes: GridSizes
) -> Tuple[jnp.ndarray, ...]:
    """Inverse of :func:`flatten_grid`."""
    splits = np.cumsum(
        [int(np.prod(gs[:-1])) for gs in grid_sizes]
    )[:-1].tolist()
    parts = jnp.split(grid, splits, axis=0)
    return tuple(
        p.reshape(*gs) for p, gs in zip(parts, grid_sizes)
    )


def if_not_none_else(x: Any, y: Any) -> Any:
    """Return ``x`` if it is not None, else ``y``."""
    return x if x is not None else y


def pad_feature_to_block_size(feature: jnp.ndarray, block_size: int):
    """Zero-pad the leading (ray) dim of a feature tensor to a block multiple."""
    n_rays = feature.shape[0]
    n_blocks = (n_rays + block_size - 1) // block_size
    n_pad = n_blocks * block_size - n_rays
    if n_pad > 0:
        pads = [(0, n_pad)] + [(0, 0)] * (feature.ndim - 1)
        feature = jnp.pad(feature, pads)
    return feature


def is_in_bounds(points: jnp.ndarray) -> jnp.ndarray:
    """True where a point lies inside the [-1, 1] cube (all dims)."""
    return jnp.all(jnp.abs(points) <= 1.0, axis=-1, keepdims=True)


def _normalize_grid_sizes(grid_sizes) -> GridSizes:
    return tuple(tuple(int(s) for s in gs) for gs in grid_sizes)


def _check_list_grid_sizes(grid: GridList, grid_sizes):
    for g, gs in zip(grid, grid_sizes):
        assert_shape(g, gs)


def check_grid(
    grid: Union[GridList, jnp.ndarray],
    grid_sizes: Optional[Sequence[Sequence[int]]] = None,
):
    """Validate a grid-list (or flat 2-D grid + sizes); see reference
    ``misc_utils.py:115-140``."""
    if isinstance(grid, (list, tuple)):
        if grid_sizes is not None:
            _check_list_grid_sizes(grid, grid_sizes)
    elif hasattr(grid, "shape"):
        assert grid_sizes is not None, (
            "grid_sizes cannot be None when grid is a flat tensor"
        )
        total = sum(int(np.prod(gs)) for gs in grid_sizes)
        assert total == grid.size, (
            "grid_sizes has to be compatible with the grid tensor shape!"
        )
    else:
        raise NotImplementedError("grid should be either an array or a list")
    return grid, grid_sizes


def check_grid_and_color_grid(
    grid,
    color_grid,
    grid_sizes=None,
    color_grid_sizes=None,
):
    """Joint validation of ``grid`` and the optional ``color_grid``; see
    reference ``misc_utils.py:143-198``."""
    is_listlike = isinstance(grid, (list, tuple))
    if color_grid is not None:
        assert isinstance(color_grid, (list, tuple)) == is_listlike, (
            "grid and color_grid should have the same type"
        )
    if is_listlike:
        if color_grid is not None:
            assert all(
                cg.shape[0] == g.shape[0] for cg, g in zip(color_grid, grid)
            ), "color_grid's batch size should match grid's"
            assert all(
                cg.shape[-1] == g.shape[-1] for cg, g in zip(color_grid, grid)
            ), "color_grid's feature dimension should match grid's"
            if color_grid_sizes is not None:
                _check_list_grid_sizes(color_grid, color_grid_sizes)
        if grid_sizes is not None:
            _check_list_grid_sizes(grid, grid_sizes)
    else:
        check_grid(grid, grid_sizes)
        if color_grid is not None:
            assert color_grid_sizes is not None, (
                "color_grid_sizes cannot be None when color_grid is a tensor"
            )
            total = sum(int(np.prod(gs)) for gs in color_grid_sizes)
            assert total == color_grid.size
    return grid, color_grid, grid_sizes, color_grid_sizes


def process_and_flatten_grid(
    grid,
    color_grid,
    grid_sizes=None,
    color_grid_sizes=None,
):
    """Flatten grid-lists to 2-D tensors + static sizes (reference
    ``misc_utils.py:201-234``); flat inputs pass through with normalized
    static sizes."""
    if isinstance(grid, (list, tuple)):
        grid, grid_sizes = flatten_grid(grid)
        if color_grid is not None:
            color_grid, color_grid_sizes = flatten_grid(color_grid)
        else:
            color_grid, color_grid_sizes = None, None
    elif hasattr(grid, "shape"):
        grid_sizes = _normalize_grid_sizes(grid_sizes)
        if color_grid is not None:
            color_grid_sizes = _normalize_grid_sizes(color_grid_sizes)
    else:
        raise NotImplementedError("grid should be either an array or a list")
    return grid, color_grid, grid_sizes, color_grid_sizes
