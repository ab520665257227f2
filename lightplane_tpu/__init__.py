"""lightplane_tpu — a TPU-native neural-3D-field rendering/splatting framework.

A ground-up JAX / Pallas re-design with the capabilities of the Lightplane
library (reference: facebookresearch/lightplane): two fused, differentiable
operators over "grid-list" scene representations —

  * ``lightplane_renderer``: Emission-Absorption raymarching (3D -> 2D) with
    tiny in-loop MLPs, O(1)-in-samples memory via a recompute backward.
  * ``lightplane_splatter`` / ``lightplane_mlp_splatter``: the dual operator
    (2D -> 3D) pushing per-ray features into a zero-initialized grid-list.

The public surface mirrors the reference ``lightplane/__init__.py:8-31`` so a
user of the reference can switch over; the implementation is TPU-first:
pure-JAX oracles, fused ``lax.scan`` streaming paths with ``jax.custom_vjp``
reverse-march recompute, and Pallas TPU kernels for the hot loops.
"""

from .ops.const import MIN_BLOCK_SIZE
from .ops.rays import (
    Rays,
    calc_harmonic_embedding,
    calc_harmonic_embedding_dim,
    default_tile,
    jitter_near_far,
    tile_ray_order,
)
from .ops.misc_utils import (
    flatten_grid,
    unflatten_grid,
    if_not_none_else,
    pad_feature_to_block_size,
    is_in_bounds,
    check_grid,
    check_grid_and_color_grid,
    process_and_flatten_grid,
)
from .ops.mlp_utils import (
    DecoderParams,
    SplatterParams,
    init_decoder_params,
    init_splatter_params,
    flatten_decoder_params,
    flatten_splatter_params,
    flattened_decoder_params_to_list,
    flattened_triton_decoder_to_list,
    get_triton_function_input_dims,
)
from .ops.rand import int_to_randn, int_to_randn_naive
from .ops.naive_renderer import (
    lightplane_renderer_naive,
    lightplane_eval_mlp,
    lightplane_eval_mlp_opacity_only,
)
from .ops.naive_splatter import (
    lightplane_splatter_naive,
    lightplane_mlp_splatter_naive,
)
from .ops.renderer import lightplane_renderer, suggest_w3_budget
from .ops.splatter import lightplane_splatter, lightplane_mlp_splatter
from .models.renderer_module import LightplaneRenderer
from .models.splatter_module import LightplaneSplatter, LightplaneMLPSplatter
from .utils.visualize import visualize_rays_plotly

__version__ = "0.1.0"
