"""Multi-chip scaling: data-parallel rays over a ``jax.sharding.Mesh``.

The reference is a single-GPU kernel library (SURVEY.md §2.5) — its only
"communication backend" is global-memory atomics.  The TPU-native extension
is embarrassingly data-parallel over rays: shard the ray batch across
devices, replicate the (small) grid + MLP parameters, and let reverse-mode AD
through ``shard_map`` insert the ``psum`` over grid/MLP gradients across ICI.

Typical use::

    mesh = make_mesh(jax.devices())
    render = data_parallel_renderer(mesh)
    depth, nlt, feat = render(rays, grid, decoder_params, num_samples=...,
                              gain=1.0)

Gradients w.r.t. grid / mlp_params are automatically all-reduced; gradients
w.r.t. per-ray quantities stay sharded.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mlp_utils import DecoderParams, SplatterParams
from ..ops.rays import Rays
from ..ops.renderer import lightplane_renderer
from ..ops.misc_utils import unflatten_grid
from ..ops.splatter import (
    lightplane_mlp_splatter,
    lightplane_splatter,
    lightplane_splatter_raw,
)

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = RAY_AXIS):
    """A 1-D mesh over all (or given) devices, for ray data-parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rays(rays: Rays, mesh: Mesh, axis_name: str = RAY_AXIS) -> Rays:
    """Place a ray batch with the ray dim sharded across the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), rays
    )


def pad_rays_to_devices(rays: Rays, n_devices: int):
    """Pad the ray batch so it divides evenly across devices."""
    return rays.pad_to_block_size(n_devices)


def data_parallel_renderer(mesh: Mesh, axis_name: str = RAY_AXIS, **defaults):
    """Build a data-parallel version of :func:`lightplane_renderer`.

    The returned function has the same signature; rays are consumed sharded
    over ``axis_name`` (ray count must divide the mesh size), grids and MLP
    params are replicated.  Under ``jax.grad``, cotangents of the replicated
    inputs are ``psum``-reduced across the mesh by shard_map's AD rule — the
    TPU equivalent of the reference's atomic grid-gradient accumulation,
    but across chips.
    """

    def render(rays: Rays, grid, decoder_params: DecoderParams, **kwargs):
        kw = dict(defaults)
        kw.update(kwargs)
        scaffold = kw.pop("scaffold", None)
        color_grid = kw.pop("color_grid", None)

        rays_tuple = (
            rays.directions, rays.origins,
            rays.grid_idx.astype(jnp.int32), rays.near, rays.far,
            rays.encoding,
        )

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P(axis_name), P(), P(), P(), P(),
            ),
            out_specs=P(axis_name),
        )
        def _sharded(rays_tuple, grid, dp_params, color_grid, scaffold):
            directions, origins, grid_idx, near, far, encoding = rays_tuple
            local_rays = Rays(
                directions=directions, origins=origins, grid_idx=grid_idx,
                near=near, far=far, encoding=encoding,
            )
            # Explicitly mark the replicated params as varying: pcast-to-varying's
            # transpose is psum, which is exactly the cross-shard gradient
            # all-reduce (the multi-chip analogue of the reference's
            # atomic grid-gradient accumulation, SURVEY.md §2.5).
            pv = lambda t: jax.tree_util.tree_map(
                lambda x: (
                    jax.lax.pcast(x, (axis_name,), to='varying')
                    if x is not None else x
                ),
                t,
            )
            grid = pv(grid)
            dp_params = pv(dp_params)
            color_grid = pv(color_grid)
            dp = dataclasses.replace(decoder_params, mlp_params=dp_params)
            return lightplane_renderer(
                local_rays, grid, dp, color_grid=color_grid,
                scaffold=scaffold, **kw,
            )

        return _sharded(
            rays_tuple, grid, decoder_params.mlp_params, color_grid, scaffold
        )

    return render


def data_parallel_splatter(mesh: Mesh, axis_name: str = RAY_AXIS,
                           use_mlp: bool = False,
                           check_vma: Optional[bool] = None,
                           **defaults):
    """Build a data-parallel splatter: rays sharded, output grids replicated.

    Each device splats its local rays into a local grid; the (feature,
    weight) accumulators are ``psum``-reduced across the mesh *before* the
    normalization quotient so the result is identical to a single-device
    splat.  Implemented by splatting un-normalized partial grids per shard.

    ``check_vma`` controls shard_map's varying-axes checker.  The default
    ``None`` resolves to True — the checker is ON for every compiled
    (real-TPU) path — EXCEPT when the Pallas kernels run in INTERPRET mode
    (CPU tests), where it resolves to False: jax 0.9.0's Pallas HLO
    interpreter evaluates the kernel jaxpr without inserting ``pvary``, so
    under ``check_vma=True`` even a trivial ``o[...] = x[...] * 2.0``
    kernel fails with "Primitive mul requires varying manual axes to
    match" (upstream bug; minimal repro + canary in
    ``tests/test_parallel.py::test_pallas_interpret_check_vma_upstream_bug``
    — when upstream fixes it the canary fails and this auto-resolution
    should be removed).  Semantics are unchanged either way — the explicit
    psum below carries the cross-shard reduction.
    """

    def splat(rays: Rays, output_grid_size, mlp_params=None, input_grid=None,
              return_list: bool = True, **kwargs):
        kw = dict(defaults)
        kw.update(kwargs)
        if check_vma is None:
            from ..ops.kernels import renderer_pallas as _rp

            resolved_check_vma = not _rp.INTERPRET
        else:
            resolved_check_vma = check_vma

        rays_tuple = (
            rays.directions, rays.origins,
            rays.grid_idx.astype(jnp.int32), rays.near, rays.far,
            rays.encoding,
        )

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis_name), P(), P()),
            out_specs=P(),
            check_vma=resolved_check_vma,
        )
        def _sharded(rays_tuple, mlp_flat, input_grid):
            directions, origins, grid_idx, near, far, encoding = rays_tuple
            local_rays = Rays(
                directions=directions, origins=origins, grid_idx=grid_idx,
                near=near, far=far, encoding=encoding,
            )
            pv = lambda t: jax.tree_util.tree_map(
                lambda x: (
                    jax.lax.pcast(x, (axis_name,), to='varying')
                    if x is not None and resolved_check_vma else x
                ),
                t,
            )
            mlp_flat = pv(mlp_flat)
            input_grid = pv(input_grid)
            mp = (
                dataclasses.replace(mlp_params, mlp_params=mlp_flat)
                if use_mlp
                else None
            )
            # The raw (feature, weight) accumulators are linear in the ray
            # set, so the per-shard partial grids psum exactly into the
            # single-device result; normalization happens after the
            # reduction.
            feat, w = lightplane_splatter_raw(
                local_rays, output_grid_size, mp, input_grid, **kw
            )
            feat, w = jax.lax.psum((feat, w), axis_name)
            return feat / jnp.clip(w, min=1e-5)

        grid_flat = _sharded(
            rays_tuple,
            mlp_params.mlp_params if mlp_params is not None else None,
            input_grid,
        )
        if return_list:
            sizes = tuple(tuple(int(s) for s in gs) for gs in output_grid_size)
            return list(unflatten_grid(grid_flat, sizes))
        return grid_flat

    return splat
