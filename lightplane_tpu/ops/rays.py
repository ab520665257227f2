"""The ``Rays`` data model and ray-encoding helpers.

Behavioral reference: ``lightplane/ray_utils.py:19-274``.  Re-designed as a
registered JAX pytree dataclass so rays flow through ``jit`` / ``vmap`` /
``shard_map`` transparently.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Rays:
    """A batch of rendering or splatting rays.

    A 3D point ``x`` along a ray is ``x = origin + t * direction`` with
    ``t in [near, far]``; ``direction`` need not be normalized.  Each ray
    carries an integer ``grid_idx`` selecting the scene (batch element) of the
    grid-list it samples/splats, and optionally a per-ray feature ``encoding``
    (e.g. a harmonic direction embedding for the renderer, or the feature to
    splat for the splatter).

    Fields (all JAX arrays, ``B`` = number of rays):
        directions: ``(B, 3)`` float
        origins:    ``(B, 3)`` float
        grid_idx:   ``(B,)``   int
        near:       ``(B,)``   float
        far:        ``(B,)``   float
        encoding:   optional ``(B, C)`` float
    """

    directions: jnp.ndarray
    origins: jnp.ndarray
    grid_idx: jnp.ndarray
    near: jnp.ndarray
    far: jnp.ndarray
    encoding: Optional[jnp.ndarray] = None

    def __post_init__(self):
        _validate_rays(
            self.directions, self.origins, self.grid_idx, self.near, self.far,
            self.encoding,
        )

    @property
    def device(self):
        d = getattr(self.directions, "devices", None)
        return next(iter(d())) if d else None

    def __len__(self) -> int:
        return self.directions.shape[0]

    def __getitem__(self, key) -> "Rays":
        vals = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            vals[f.name] = None if v is None else v[key]
        return type(self)(**vals)

    def pad_to_block_size(self, block_size: int) -> Tuple["Rays", int]:
        """Zero-pad the ray batch up to a multiple of ``block_size``.

        Returns the padded rays and the number of rays added.
        """
        n_rays = self.directions.shape[0]
        n_blocks = (n_rays + block_size - 1) // block_size
        n_pad = n_blocks * block_size - n_rays
        if n_pad == 0:
            return self, 0
        vals = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is None:
                vals[f.name] = None
            else:
                pads = [(0, n_pad)] + [(0, 0)] * (v.ndim - 1)
                vals[f.name] = jnp.pad(v, pads)
        return type(self)(**vals), n_pad

    def to(self, device, copy: bool = False) -> "Rays":
        """Place all fields on ``device`` (API parity with the reference)."""
        vals = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            vals[f.name] = None if v is None else jax.device_put(v, device)
        return type(self)(**vals)

    def clone(self) -> "Rays":
        vals = {
            f.name: getattr(self, f.name) for f in dataclasses.fields(self)
        }
        return type(self)(**{
            k: (None if v is None else jnp.array(v)) for k, v in vals.items()
        })


def calc_harmonic_embedding(
    directions: jnp.ndarray, n_harmonic_functions: int
) -> jnp.ndarray:
    """NeRF-style harmonic embedding of ray directions.

    Returns ``[sin(2^k d), cos(2^k d) for k < n, d]`` concatenated on the last
    axis; with ``n_harmonic_functions == 0`` returns the directions unchanged.
    Matches reference ``ray_utils.py:181-212``.
    """
    if n_harmonic_functions == 0:
        return directions
    freqs = 2.0 ** jnp.arange(n_harmonic_functions, dtype=directions.dtype)
    zero_half_pi = jnp.asarray([0.0, 0.5 * np.pi], dtype=directions.dtype)
    embed = directions[..., None] * freqs  # [..., 3, n]
    embed = embed[..., None, :, :] + zero_half_pi[..., None, None]  # [...,2,3,n]
    embed = jnp.sin(embed)
    embed = embed.reshape(*directions.shape[:-1], -1)
    return jnp.concatenate([embed, directions], axis=-1)


def calc_harmonic_embedding_dim(n_harmonic_functions: int) -> int:
    """Output dim of ``calc_harmonic_embedding``: 3 + 2*3*n."""
    return 3 + 2 * 3 * n_harmonic_functions


def jitter_near_far(
    near: jnp.ndarray, far: jnp.ndarray, num_samples: int, key: jax.Array
):
    """Jitter near/far by a shared uniform offset in [-delta, delta],
    delta = (far - near) / num_samples.  Takes an explicit PRNG key
    (functional JAX replacement for the reference's global torch RNG)."""
    delta = (far - near) / num_samples
    offs = (2.0 * jax.random.uniform(key, near.shape, near.dtype) - 1.0) * delta
    return near + offs, far + offs


def _validate_rays(directions, origins, grid_idx, near, far, encoding):
    n_rays = directions.shape[0]
    assert directions.ndim == 2 and directions.shape[1] == 3
    assert origins.ndim == 2 and origins.shape[1] == 3
    assert grid_idx.ndim == 1
    assert near.ndim == 1 and far.ndim == 1
    assert jnp.issubdtype(jnp.asarray(grid_idx).dtype, jnp.integer), (
        "grid_idx must be an integer array"
    )
    for vn, v in zip(
        ["origins", "near", "far", "grid_idx"], [origins, near, far, grid_idx]
    ):
        assert v.shape[0] == n_rays, (
            f"Unexpected number of elements in {vn} "
            f"({v.shape[0]}, expected {n_rays})"
        )
    if encoding is not None:
        assert encoding.ndim == 2 and encoding.shape[0] == n_rays


def default_tile(height: int, width: int):
    """Pixel-tile shape for :func:`tile_ray_order`, sized so one tile's
    frustum footprint fits the renderer's packed 2D windows.

    A fixed 8x32-pixel tile spans 1/4 of a 128-wide image — too wide a
    frustum slice for the 8-cell plane windows, so small images
    previously regressed to the 1D-window kernels (201k vs 702k rays/s,
    docs/benchmark.md).  Narrower tiles keep the footprint constant in
    *image fractions*: pass ``tile_rays=th*tw`` to the renderer so the
    kernel blocks match one tile.
    """
    m = min(height, width)
    if m >= 256:
        return (8, 32)
    if m >= 96:
        return (8, 16)
    return (8, 8)


def tile_ray_order(height: int, width: int, tile=None):
    """Permutation putting the rays of an image in tile-major order.

    The fused renderer's windowed fast paths need each ray block to be
    spatially coherent; raster order makes a block span the full image
    width.  Reordering rays into ``tile`` (rows x cols) pixel tiles
    (default: :func:`default_tile` for the image size) keeps every block
    inside a small frustum, enabling the packed 2D-window kernels.

    Returns ``(order, inverse)`` index arrays: render with
    ``rays[order]`` and scatter outputs back with ``out[inverse]``.
    Falls back to the identity when the tile does not divide the image.
    """
    import numpy as np

    th, tw = tile if tile is not None else default_tile(height, width)
    n = height * width
    if height % th or width % tw:
        idx = np.arange(n)
        return idx, idx
    idx = np.arange(n).reshape(height, width)
    order = (
        idx.reshape(height // th, th, width // tw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    inverse = np.argsort(order)
    return order, inverse
