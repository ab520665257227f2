"""``LightplaneRenderer`` — the parameter-owning module layer (Flax linen).

TPU-native counterpart of the reference's ``torch.nn.Module``
(``lightplane/renderer_module.py:38-601``): owns the packed decoder MLP
parameters and the harmonic ray-embedding linear layer, adds background-color
compositing, near/far jitter, the naive/fused switch, pointwise decoder
evaluation, and scaffold computation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.misc_utils import if_not_none_else, process_and_flatten_grid
from ..ops.mlp_utils import (
    DecoderParams,
    flattened_decoder_params_to_list,
    init_decoder_params,
)
from ..ops.naive_renderer import (
    lightplane_eval_mlp,
    lightplane_eval_mlp_opacity_only,
    lightplane_renderer_naive,
)
from ..ops.renderer import lightplane_renderer
from ..ops.rays import (
    Rays,
    calc_harmonic_embedding,
    calc_harmonic_embedding_dim,
    jitter_near_far,
    tile_ray_order,
)


class LightplaneRenderer(nn.Module):
    """Flax module wrapping :func:`lightplane_renderer`.

    Construction args mirror the reference ctor
    (``renderer_module.py:39-110``); ``use_naive_impl`` switches to the
    materializing oracle.  RNG: near/far jitter and noise seeds come from the
    module's ``"jitter"`` / ``"noise"`` RNG streams when enabled.
    """

    num_samples: int
    color_chn: int
    grid_chn: int
    mlp_hidden_chn: int
    mlp_n_layers_opacity: int = 2
    mlp_n_layers_trunk: int = 2
    mlp_n_layers_color: int = 2
    use_separate_color_grid: bool = False
    opacity_init_bias: float = -5.0
    gain: float = 1.0
    bg_color: Union[Tuple[float, ...], float] = 0.0
    enable_direction_dependent_colors: bool = True
    ray_embedding_num_harmonics: Optional[int] = 3
    num_samples_inf: int = 0
    mask_out_of_bounds_samples: bool = False
    contract_coords: bool = False
    disparity_at_inf: float = 1e-5
    inject_noise_sigma: float = 0.0
    inject_noise_seed: Optional[int] = None
    rays_jitter_near_far: bool = False
    return_log_transmittance: bool = False
    use_naive_impl: bool = False

    def setup(self):
        n_layers_trunk = self.mlp_n_layers_trunk
        if self.use_separate_color_grid:
            n_layers_trunk = 0

        # template decoder params (shapes only; real init below)
        template = init_decoder_params(
            jax.random.PRNGKey(0),
            n_layers_opacity=self.mlp_n_layers_opacity,
            n_layers_trunk=n_layers_trunk,
            n_layers_color=self.mlp_n_layers_color,
            input_chn=self.grid_chn,
            hidden_chn=self.mlp_hidden_chn,
            color_chn=self.color_chn,
            opacity_init_bias=self.opacity_init_bias,
            pad_color_channels_to_min_block_size=True,
            use_separate_color_grid=self.use_separate_color_grid,
        )
        self._n_hidden_trunk = template.n_hidden_trunk
        self._n_hidden_opacity = template.n_hidden_opacity
        self._n_hidden_color = template.n_hidden_color
        self.rays_encoding_dim = int(template.n_hidden_color[0])

        def _init_mlp_params(key, shape):
            dp = init_decoder_params(
                key,
                n_layers_opacity=self.mlp_n_layers_opacity,
                n_layers_trunk=n_layers_trunk,
                n_layers_color=self.mlp_n_layers_color,
                input_chn=self.grid_chn,
                hidden_chn=self.mlp_hidden_chn,
                color_chn=self.color_chn,
                opacity_init_bias=self.opacity_init_bias,
                pad_color_channels_to_min_block_size=True,
                use_separate_color_grid=self.use_separate_color_grid,
            )
            return dp.mlp_params

        self.mlp_params = self.param(
            "mlp_params", _init_mlp_params, (int(template.mlp_params.size),)
        )

        if self.ray_embedding_num_harmonics is not None:
            if not self.enable_direction_dependent_colors:
                raise ValueError(
                    "LightplaneRenderer's viewpoint dependent colors are"
                    " disabled (enable_direction_dependent_colors=False), but"
                    " `ray_embedding_num_harmonics` is set. Set"
                    " ray_embedding_num_harmonics=None if you intended to"
                    " disable viewpoint dependent colors."
                )
            self.harmonic_ray_embedding_linear = nn.Dense(
                self.rays_encoding_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
            )

    def get_decoder_params(self) -> DecoderParams:
        return DecoderParams(
            self.mlp_params,
            self._n_hidden_trunk,
            self._n_hidden_opacity,
            self._n_hidden_color,
            color_chn=self.color_chn,
        )

    def get_decoder_params_list(self):
        return flattened_decoder_params_to_list(
            self.mlp_params,
            self._n_hidden_trunk,
            self._n_hidden_opacity,
            self._n_hidden_color,
        )

    def _process_bg_color(self, bg_color) -> jnp.ndarray:
        if bg_color is None:
            bg_color = self.bg_color
        if isinstance(bg_color, (int, float)):
            bg_color = jnp.full((self.color_chn,), float(bg_color))
        else:
            bg_color = jnp.asarray(bg_color, dtype=jnp.float32)
        assert bg_color.shape[-1] == self.color_chn
        return bg_color

    def _get_ray_encoding(self, ray_encoding, directions):
        if ray_encoding is not None:
            assert self.ray_embedding_num_harmonics is None
            return ray_encoding
        return self._get_ray_embedding(directions)

    def _get_ray_embedding(self, ray_directions):
        if not self.enable_direction_dependent_colors:
            return jnp.zeros(
                (ray_directions.shape[0], self.rays_encoding_dim),
                ray_directions.dtype,
            )
        assert self.ray_embedding_num_harmonics is not None
        normed = ray_directions / jnp.clip(
            jnp.linalg.norm(ray_directions, axis=-1, keepdims=True), min=1e-12
        )
        harmonic_embed = calc_harmonic_embedding(
            normed, self.ray_embedding_num_harmonics
        )
        return self.harmonic_ray_embedding_linear(harmonic_embed)

    def eval_decoder_at_points(
        self,
        pts: jnp.ndarray,
        pts_to_grid_idx: jnp.ndarray,
        rays_encoding: Optional[jnp.ndarray],
        feature_grid,
        color_feature_grid=None,
        scaffold: Optional[jnp.ndarray] = None,
        gain: Optional[float] = None,
        mask_out_of_bounds_samples: Optional[bool] = None,
        contract_coords: Optional[bool] = None,
        directions: Optional[jnp.ndarray] = None,
    ):
        """Evaluate the decoder at arbitrary points ``[n_rays, n_pts, 3]``
        (reference ``renderer_module.py:183-241``)."""
        n_rays, n_pts, pts_dim = pts.shape
        assert pts_dim == 3
        if rays_encoding is None:
            assert directions is not None, (
                "Must pass one of (rays_encoding, directions)"
            )
        grid_flat, color_grid_flat, grid_sizes, color_grid_sizes = (
            process_and_flatten_grid(feature_grid, color_feature_grid)
        )
        return lightplane_eval_mlp(
            points=pts,
            grid_flat=grid_flat,
            grid_sizes=grid_sizes,
            ray_grid_idx=pts_to_grid_idx,
            decoder_params=self.get_decoder_params(),
            rays_encoding=self._get_ray_encoding(rays_encoding, directions),
            gain=if_not_none_else(gain, self.gain),
            contract_coords=if_not_none_else(
                contract_coords, self.contract_coords
            ),
            mask_out_of_bounds_samples=if_not_none_else(
                mask_out_of_bounds_samples, self.mask_out_of_bounds_samples
            ),
            inject_opacity_noise=None,
            scaffold=scaffold,
            color_grid_flat=color_grid_flat,
            color_grid_sizes=color_grid_sizes,
        )

    def eval_opacity_at_points(
        self,
        pts: jnp.ndarray,
        pts_to_grid_idx: jnp.ndarray,
        feature_grid,
        scaffold: Optional[jnp.ndarray] = None,
        gain: Optional[float] = None,
        mask_out_of_bounds_samples: Optional[bool] = None,
        grid_sizes=None,
    ):
        """Opacity at points ``[n_rays, n_pts, 3]`` (reference
        ``renderer_module.py:302-346``)."""
        grid_flat, _, grid_sizes, _ = process_and_flatten_grid(
            feature_grid, None, grid_sizes, None
        )
        return lightplane_eval_mlp_opacity_only(
            points=pts,
            grid_flat=grid_flat,
            grid_sizes=grid_sizes,
            ray_grid_idx=pts_to_grid_idx,
            decoder_params=self.get_decoder_params(),
            gain=if_not_none_else(gain, self.gain),
            mask_out_of_bounds_samples=if_not_none_else(
                mask_out_of_bounds_samples, self.mask_out_of_bounds_samples
            ),
            inject_opacity_noise=None,
            scaffold=scaffold,
        )

    def calculate_scaffold(
        self,
        feature_grid,
        scaffold_size: Tuple[int, int, int, int],
        threshold: float = 1e-7,
        grid_sizes=None,
        dilate_scaffold: int = 2,
    ):
        """Compute an occupancy scaffold by dense opacity evaluation +
        max-pool dilation + thresholding (reference
        ``renderer_module.py:348-417``)."""
        B, D, H, W = scaffold_size
        zs = jnp.linspace(0, 1, D)
        ys = jnp.linspace(0, 1, H)
        xs = jnp.linspace(0, 1, W)
        # grid of sample points [D, H, W, 3] with p=(x, y, z)
        gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        dense_xyz = jnp.stack([gx, gy, gz], axis=-1) * 2.0 - 1.0

        scaffold = []
        for b in range(B):
            op = self.eval_opacity_at_points(
                pts=dense_xyz.reshape(D, H * W, 3),
                pts_to_grid_idx=jnp.full((D,), b, jnp.int32),
                feature_grid=feature_grid,
                scaffold=None,
                gain=self.gain,
                mask_out_of_bounds_samples=self.mask_out_of_bounds_samples,
                grid_sizes=grid_sizes,
            )
            scaffold.append(op.reshape(D, H, W))
        scaffold = jnp.stack(scaffold)
        scaffold = jax.lax.stop_gradient(scaffold)

        if dilate_scaffold > 0:
            ks = dilate_scaffold * 2 + 1
            scaffold = jax.lax.reduce_window(
                scaffold,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, ks, ks, ks),
                window_strides=(1, 1, 1, 1),
                padding=[(0, 0)] + [(dilate_scaffold, dilate_scaffold)] * 3,
            )
        return (scaffold > threshold).astype(jnp.float32)

    def __call__(
        self,
        rays: Rays,
        feature_grid,
        color_feature_grid=None,
        scaffold: Optional[jnp.ndarray] = None,
        grid_sizes=None,
        color_grid_sizes=None,
        # If set, the following args override the module's defaults:
        bg_color=None,
        num_samples: Optional[int] = None,
        gain: Optional[float] = None,
        num_samples_inf: Optional[int] = None,
        mask_out_of_bounds_samples: Optional[bool] = None,
        contract_coords: Optional[bool] = None,
        disparity_at_inf: Optional[float] = None,
        inject_noise_sigma: Optional[float] = None,
        inject_noise_seed: Optional[int] = None,
        rays_jitter_near_far: Optional[bool] = None,
        return_log_transmittance: Optional[bool] = None,
        image_size: Optional[Tuple[int, int]] = None,
        w3_budget: Optional[Tuple[int, int, int]] = None,
    ):
        """Render; returns ``(ray_length, alpha, feature_render)``
        (reference ``renderer_module.py:419-563``).

        ``image_size=(height, width)``: declares that ``rays`` are the
        raster-order pixels of one image.  The module then internally
        permutes them into spatially-coherent pixel tiles
        (:func:`tile_ray_order`) before the fused kernel call and
        inverse-scatters the per-ray outputs, so raster-order callers get
        the packed windowed fast paths without changing their data layout
        (outputs stay in the input order).  TPU-only extension — the
        reference's 16-ray CUDA blocks have no such layout sensitivity.
        """
        num_samples = if_not_none_else(num_samples, self.num_samples)
        gain = if_not_none_else(gain, self.gain)
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
        inject_noise_sigma = if_not_none_else(
            inject_noise_sigma, self.inject_noise_sigma
        )
        inject_noise_seed = if_not_none_else(
            inject_noise_seed, self.inject_noise_seed
        )
        rays_jitter_near_far = if_not_none_else(
            rays_jitter_near_far, self.rays_jitter_near_far
        )
        return_log_transmittance = if_not_none_else(
            return_log_transmittance, self.return_log_transmittance
        )

        bg_color = self._process_bg_color(bg_color)

        _check_renderer_ray_encoding_input(
            rays.encoding,
            self.ray_embedding_num_harmonics,
            self.rays_encoding_dim,
            self.enable_direction_dependent_colors,
        )
        encoding = self._get_ray_encoding(rays.encoding, rays.directions)
        near, far = rays.near, rays.far
        if rays_jitter_near_far:
            near, far = jitter_near_far(
                near, far, num_samples, self.make_rng("jitter")
            )
        rays_p = dataclasses.replace(
            rays, near=near, far=far, encoding=encoding
        )

        inv = None
        tile_rays = None
        if image_size is not None and not self.use_naive_impl:
            from lightplane_tpu.ops.rays import default_tile

            h, w = image_size
            n_rays = rays_p.directions.shape[0]
            assert n_rays == h * w, (
                f"image_size {image_size} does not match the ray count "
                f"({n_rays} != {h * w})"
            )
            tile = default_tile(h, w)
            # beyond-VMEM grids run the W3 boxed-DMA kernels, whose ray
            # blocks are sized for compact square-ish pixel tiles — use
            # the W3 tile when it divides the image
            from lightplane_tpu.ops.kernels.renderer_pallas import (
                MAX_CELLS_PER_GRID,
            )

            if any(
                int(np.prod(g.shape[:-1])) > MAX_CELLS_PER_GRID
                for g in (list(feature_grid)
                          + list(color_feature_grid or []))
            ):
                from lightplane_tpu.ops.kernels.renderer_w3 import W3_TILE

                if h % W3_TILE[0] == 0 and w % W3_TILE[1] == 0:
                    tile = W3_TILE
            order_np, inv_np = tile_ray_order(h, w, tile=tile)
            if not np.array_equal(order_np, np.arange(n_rays)):
                inv = jnp.asarray(inv_np)
                rays_p = rays_p[jnp.asarray(order_np)]
                tile_rays = tile[0] * tile[1]

        if inject_noise_sigma > 0.0 and inject_noise_seed is None:
            inject_noise_seed = int(
                jax.random.randint(self.make_rng("noise"), (), 0, 1000000)
            )

        lightplane_fn = (
            lightplane_renderer_naive
            if self.use_naive_impl
            else lightplane_renderer
        )
        ray_length_render, negative_log_transmittance, feature_render = (
            lightplane_fn(
                rays_p,
                feature_grid,
                self.get_decoder_params(),
                num_samples=num_samples,
                gain=gain,
                num_samples_inf=num_samples_inf,
                mask_out_of_bounds_samples=mask_out_of_bounds_samples,
                contract_coords=contract_coords,
                disparity_at_inf=disparity_at_inf,
                inject_noise_sigma=inject_noise_sigma,
                inject_noise_seed=inject_noise_seed,
                scaffold=scaffold,
                color_grid=color_feature_grid,
                grid_sizes=grid_sizes,
                color_grid_sizes=color_grid_sizes,
                **(
                    {"tile_rays": tile_rays, "w3_budget": w3_budget}
                    if not self.use_naive_impl else {}
                ),
            )
        )

        if inv is not None:
            ray_length_render = ray_length_render[inv]
            negative_log_transmittance = negative_log_transmittance[inv]
            feature_render = feature_render[inv]

        inverted_mask = jnp.exp(-negative_log_transmittance)
        feature_render = feature_render + inverted_mask[..., None] * bg_color
        if return_log_transmittance:
            alpha = -negative_log_transmittance
        else:
            alpha = 1.0 - inverted_mask
        return ray_length_render, alpha, feature_render


def _check_renderer_ray_encoding_input(
    ray_encoding,
    ray_embedding_num_harmonics,
    ray_encoding_dim: int,
    enable_direction_dependent_colors: bool,
):
    """Mirror of reference ``renderer_module.py:604-667``."""
    if ray_encoding is not None and ray_encoding.shape[1] != ray_encoding_dim:
        raise ValueError(
            f"Ray encoding has a wrong dimension."
            f" Expected: {ray_encoding_dim}, got: {ray_encoding.shape[1]}"
        )
    if not enable_direction_dependent_colors:
        if ray_encoding is not None:
            raise ValueError(
                "Viewpoint dependent colors are disabled but rays.encoding is"
                " set; set rays.encoding=None."
            )
        if ray_embedding_num_harmonics is not None:
            raise ValueError(
                "Viewpoint dependent colors are disabled but"
                " ray_embedding_num_harmonics is set; set it to None."
            )
        return
    if (ray_embedding_num_harmonics is None) == (ray_encoding is None):
        if ray_encoding is None:
            raise ValueError(
                "rays.encoding is unset, but the module is not configured to"
                " compute harmonic ray embeddings"
                " (ray_embedding_num_harmonics is None). Set one of the two."
            )
        raise ValueError(
            "rays.encoding is set, but the module is also configured to"
            " compute harmonic ray embeddings"
            " (ray_embedding_num_harmonics is set). Set only one of the two."
        )
