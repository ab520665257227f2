"""``LightplaneSplatter`` / ``LightplaneMLPSplatter`` module layer (Flax).

Counterpart of the reference's ``lightplane/splatter_module.py:25-348``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.misc_utils import if_not_none_else
from ..ops.mlp_utils import SplatterParams, init_splatter_params
from ..ops.naive_splatter import (
    lightplane_mlp_splatter_naive,
    lightplane_splatter_naive,
)
from ..ops.splatter import lightplane_mlp_splatter, lightplane_splatter
from ..ops.rays import Rays, jitter_near_far


def _check_splatter_ray_encoding_input(ray_encoding, ray_encoding_dim):
    if ray_encoding is None:
        raise ValueError(
            "The encoding field of input rays is None."
            " However, the Splatter requires an encoding for input rays."
        )
    if ray_encoding.shape[1] != ray_encoding_dim:
        raise ValueError(
            f"Ray encoding has a wrong dimension."
            f" Expected: {ray_encoding_dim}, got: {ray_encoding.shape[1]}"
        )


class LightplaneSplatter(nn.Module):
    """Parameter-free splatter module: splats ``rays.encoding`` directly into
    a zero-initialized ``output_grid`` (reference
    ``splatter_module.py:25-161``)."""

    num_samples: int
    grid_chn: int
    num_samples_inf: int = 0
    mask_out_of_bounds_samples: bool = False
    contract_coords: bool = False
    disparity_at_inf: float = 1e-5
    rays_jitter_near_far: bool = False
    use_naive_impl: bool = False

    def get_splatter_params(self) -> Optional[SplatterParams]:
        return None

    @nn.compact
    def __call__(
        self,
        rays: Rays,
        grid_size,
        num_samples: Optional[int] = None,
        num_samples_inf: Optional[int] = None,
        mask_out_of_bounds_samples: Optional[bool] = None,
        contract_coords: Optional[bool] = None,
        disparity_at_inf: Optional[float] = None,
        rays_jitter_near_far: Optional[bool] = None,
        return_list: bool = True,
    ):
        num_samples = if_not_none_else(num_samples, self.num_samples)
        num_samples_inf = if_not_none_else(
            num_samples_inf, self.num_samples_inf
        )
        mask_out_of_bounds_samples = if_not_none_else(
            mask_out_of_bounds_samples, self.mask_out_of_bounds_samples
        )
        contract_coords = if_not_none_else(
            contract_coords, self.contract_coords
        )
        disparity_at_inf = if_not_none_else(
            disparity_at_inf, self.disparity_at_inf
        )
        rays_jitter_near_far = if_not_none_else(
            rays_jitter_near_far, self.rays_jitter_near_far
        )
        _check_splatter_ray_encoding_input(rays.encoding, self.grid_chn)

        if rays_jitter_near_far:
            near, far = jitter_near_far(
                rays.near, rays.far, num_samples, self.make_rng("jitter")
            )
            rays = dataclasses.replace(rays, near=near, far=far)

        fn = (
            lightplane_splatter_naive
            if self.use_naive_impl
            else lightplane_splatter
        )
        return fn(
            rays,
            grid_size,
            num_samples=num_samples,
            num_samples_inf=num_samples_inf,
            mask_out_of_bounds_samples=mask_out_of_bounds_samples,
            contract_coords=contract_coords,
            disparity_at_inf=disparity_at_inf,
            return_list=return_list,
        )


class LightplaneMLPSplatter(nn.Module):
    """Splatter with a learnable MLP + prior ``input_grid`` (reference
    ``splatter_module.py:164-331``)."""

    num_samples: int
    grid_chn: int
    input_grid_chn: int = 32
    mlp_hidden_chn: int = 32
    mlp_n_layers: int = 2
    num_samples_inf: int = 0
    mask_out_of_bounds_samples: bool = False
    contract_coords: bool = False
    disparity_at_inf: float = 1e-5
    rays_jitter_near_far: bool = False
    use_naive_impl: bool = False

    def setup(self):
        template = init_splatter_params(
            jax.random.PRNGKey(0),
            n_layers=self.mlp_n_layers,
            input_chn=self.input_grid_chn,
            hidden_chn=self.mlp_hidden_chn,
            out_chn=self.grid_chn,
        )
        self._n_hidden = template.n_hidden

        def _init(key, shape):
            return init_splatter_params(
                key,
                n_layers=self.mlp_n_layers,
                input_chn=self.input_grid_chn,
                hidden_chn=self.mlp_hidden_chn,
                out_chn=self.grid_chn,
            ).mlp_params

        self.mlp_params = self.param(
            "mlp_params", _init, (int(template.mlp_params.size),)
        )
        self.rays_encoding_dim = self.input_grid_chn

    def get_splatter_params(self) -> SplatterParams:
        return SplatterParams(self.mlp_params, self._n_hidden)

    def __call__(
        self,
        rays: Rays,
        grid_size,
        input_grid,
        num_samples: Optional[int] = None,
        num_samples_inf: Optional[int] = None,
        mask_out_of_bounds_samples: Optional[bool] = None,
        contract_coords: Optional[bool] = None,
        disparity_at_inf: Optional[float] = None,
        input_grid_sizes=None,
        rays_jitter_near_far: Optional[bool] = None,
        return_list: bool = True,
    ):
        num_samples = if_not_none_else(num_samples, self.num_samples)
        num_samples_inf = if_not_none_else(
            num_samples_inf, self.num_samples_inf
        )
        mask_out_of_bounds_samples = if_not_none_else(
            mask_out_of_bounds_samples, self.mask_out_of_bounds_samples
        )
        contract_coords = if_not_none_else(
            contract_coords, self.contract_coords
        )
        disparity_at_inf = if_not_none_else(
            disparity_at_inf, self.disparity_at_inf
        )
        rays_jitter_near_far = if_not_none_else(
            rays_jitter_near_far, self.rays_jitter_near_far
        )
        _check_splatter_ray_encoding_input(
            rays.encoding, self.rays_encoding_dim
        )
        assert input_grid is not None, "input_grid must be provided"

        if rays_jitter_near_far:
            near, far = jitter_near_far(
                rays.near, rays.far, num_samples, self.make_rng("jitter")
            )
            rays = dataclasses.replace(rays, near=near, far=far)

        fn = (
            lightplane_mlp_splatter_naive
            if self.use_naive_impl
            else lightplane_mlp_splatter
        )
        return fn(
            rays,
            grid_size,
            self.get_splatter_params(),
            input_grid,
            num_samples=num_samples,
            num_samples_inf=num_samples_inf,
            mask_out_of_bounds_samples=mask_out_of_bounds_samples,
            contract_coords=contract_coords,
            disparity_at_inf=disparity_at_inf,
            input_grid_sizes=input_grid_sizes,
            return_list=return_list,
        )
