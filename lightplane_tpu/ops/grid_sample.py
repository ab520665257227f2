"""Trilinear/bilinear grid sampling and splatting over flattened grid-lists.

One generic trilinear sampler handles voxel grids *and* planes: a singleton
spatial dim collapses its coordinate to index 0, so a ``[B, 1, H, W, C]``
"xy"-plane is sampled bilinearly in (x, y), etc.  This mirrors the device
library of the reference (``triton_src/shared/grid_sample_util.py:209-247``,
``:638-714``, ``:1088-1186``) and is numerically identical to
``torch.nn.functional.grid_sample(..., align_corners=False,
padding_mode="zeros")`` used by the reference oracle
(``naive_renderer.py:674-731``).

Coordinate convention: a point ``p = (x, y, z)`` in ``[-1, 1]^3`` indexes
``x -> W, y -> H, z -> D``; ``align_corners=False`` mapping
``i = ((p + 1) / 2) * S - 0.5``.  Out-of-bounds corners contribute zero
(zeros-padding semantics); whole-sample masking via
``mask_out_of_bounds_samples`` zeroes points outside the [-1, 1] cube.

Everything here is differentiable by JAX AD; gather and scatter-add are
transposes of each other, so the oracle needs no hand-written backward.
Grid sizes are static Python tuples -> each grid-list shape specializes the
compiled computation (TPU-first; no device-tensor shape reads as in the
reference kernel ``grid_sample_util.py:1104-1114``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .misc_utils import GridSizes, is_in_bounds


def grid_row_offsets(grid_sizes: GridSizes):
    """Row offset of each sub-grid inside the flattened ``[V_total, C]``."""
    offs = [0]
    for gs in grid_sizes:
        offs.append(offs[-1] + int(np.prod(gs[:-1])))
    return tuple(offs)


def _corner_rows_and_weights(
    size, points, batch_idx, mode: str
):
    """Flat row indices + interp weights of the sampling corners of one
    sub-grid.

    Returns ``(rows, weights)`` with shapes ``[..., K]`` where K = 8 for
    linear mode and 1 for nearest.  OOB corners get weight 0 (indices are
    clamped so the gather stays in range).
    """
    B, D, H, W, C = size
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    fx = ((x + 1.0) * 0.5) * W - 0.5 if W > 1 else jnp.zeros_like(x)
    fy = ((y + 1.0) * 0.5) * H - 0.5 if H > 1 else jnp.zeros_like(y)
    fz = ((z + 1.0) * 0.5) * D - 0.5 if D > 1 else jnp.zeros_like(z)

    if mode == "nearest":
        cx = jnp.round(fx)
        cy = jnp.round(fy)
        cz = jnp.round(fz)
        corners = [(cx, cy, cz, jnp.ones_like(fx))]
    elif mode in ("linear", "bilinear"):
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        z0 = jnp.floor(fz)
        tx, ty, tz = fx - x0, fy - y0, fz - z0
        corners = []
        for dz in (0.0, 1.0):
            wz = tz if dz else (1.0 - tz)
            for dy in (0.0, 1.0):
                wy = ty if dy else (1.0 - ty)
                for dx in (0.0, 1.0):
                    wx = tx if dx else (1.0 - tx)
                    corners.append((x0 + dx, y0 + dy, z0 + dz, wx * wy * wz))
    else:
        raise ValueError(f"unknown sampling mode {mode!r}")

    rows, weights = [], []
    for cx, cy, cz, w in corners:
        valid = (
            (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H) & (cz >= 0) & (cz < D)
        )
        cxi = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        cyi = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        czi = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
        row = ((batch_idx * D + czi) * H + cyi) * W + cxi
        rows.append(row)
        weights.append(jnp.where(valid, w, 0.0))
    return jnp.stack(rows, axis=-1), jnp.stack(weights, axis=-1)


def sample_grid_rep(
    grid_flat: jnp.ndarray,
    grid_sizes: GridSizes,
    points: jnp.ndarray,
    grid_idx: jnp.ndarray,
    mask_out_of_bounds_samples: bool = False,
    mode: str = "linear",
) -> jnp.ndarray:
    """Sample the summed grid-list at ``points``.

    Args:
        grid_flat: flattened grid-list ``[V_total, C]``.
        grid_sizes: static per-grid shapes ``((B, D, H, W, C), ...)``.
        points: ``[R, ..., 3]`` in ``[-1, 1]``.
        grid_idx: ``[R]`` int batch index per leading row of ``points``.
        mask_out_of_bounds_samples: zero contributions of points outside the
            [-1, 1] cube.
        mode: "linear" (tri/bi-linear) or "nearest".

    Returns:
        ``[R, ..., C]`` — features sampled from each sub-grid and summed
        (the grid-list decomposition: voxel + triplane mixes supported).
    """
    offsets = grid_row_offsets(grid_sizes)
    bshape = points.shape[:-1]
    bidx = grid_idx.reshape(
        (grid_idx.shape[0],) + (1,) * (len(bshape) - 1)
    ).astype(jnp.int32)
    bidx = jnp.broadcast_to(bidx, bshape)

    out = None
    for gs, off in zip(grid_sizes, offsets[:-1]):
        rows, weights = _corner_rows_and_weights(gs, points, bidx, mode)
        vals = jnp.take(grid_flat, rows + off, axis=0)  # [..., K, C]
        sampled = jnp.einsum("...k,...kc->...c", weights, vals)
        out = sampled if out is None else out + sampled

    if mask_out_of_bounds_samples:
        out = out * is_in_bounds(points).astype(out.dtype)
    return out


def splat_grid_rep(
    features: jnp.ndarray,
    grid_flat_shape_or_acc,
    grid_sizes: GridSizes,
    points: jnp.ndarray,
    grid_idx: jnp.ndarray,
    mask_out_of_bounds_samples: bool = False,
) -> jnp.ndarray:
    """Splat ``features`` at ``points`` into a flattened grid-list
    (the transpose of :func:`sample_grid_rep`, linear mode).

    Args:
        features: ``[R, ..., C]`` values to splat.
        grid_flat_shape_or_acc: either an existing flat accumulator
            ``[V_total, C]`` to add into, or an int ``V_total`` (a fresh
            zero accumulator is created).
        grid_sizes, points, grid_idx, mask_out_of_bounds_samples: as in
            :func:`sample_grid_rep`.

    Returns:
        the flat ``[V_total, C]`` accumulator with the splat added.
    """
    offsets = grid_row_offsets(grid_sizes)
    C = features.shape[-1]
    if isinstance(grid_flat_shape_or_acc, int):
        acc = jnp.zeros((grid_flat_shape_or_acc, C), features.dtype)
    else:
        acc = grid_flat_shape_or_acc

    bshape = points.shape[:-1]
    bidx = grid_idx.reshape(
        (grid_idx.shape[0],) + (1,) * (len(bshape) - 1)
    ).astype(jnp.int32)
    bidx = jnp.broadcast_to(bidx, bshape)

    feats = features
    if mask_out_of_bounds_samples:
        feats = feats * is_in_bounds(points).astype(feats.dtype)

    for gs, off in zip(grid_sizes, offsets[:-1]):
        rows, weights = _corner_rows_and_weights(gs, points, bidx, "linear")
        contrib = weights[..., None] * feats[..., None, :]  # [..., K, C]
        acc = acc.at[(rows + off).reshape(-1)].add(
            contrib.reshape(-1, C), mode="drop"
        )
    return acc


# ---------------------------------------------------------------------------
# Grid-list (unflattened) convenience wrappers used by the naive oracles
# ---------------------------------------------------------------------------


def sample_grid_list(
    grid: Sequence[jnp.ndarray],
    points: jnp.ndarray,
    grid_idx: jnp.ndarray,
    mask_out_of_bounds_samples: bool,
    mode: str = "linear",
) -> jnp.ndarray:
    """Sample a grid-list of ``[B, D, H, W, C]`` arrays (oracle entry point;
    reference ``naive_renderer.py:625-671``)."""
    from .misc_utils import flatten_grid

    grid_flat, grid_sizes = flatten_grid(list(grid))
    return sample_grid_rep(
        grid_flat, grid_sizes, points, grid_idx, mask_out_of_bounds_samples,
        mode,
    )
