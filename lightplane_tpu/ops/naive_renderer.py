"""Pure-JAX "naive" renderer — the numerics oracle.

Materializes every ``[num_rays, num_samples, ...]`` intermediate and relies
on JAX AD for gradients; used for testing/debugging the fused paths, exactly
as the reference uses its PyTorch oracle (``lightplane/naive_renderer.py``).
``checkpointing=True`` wraps the per-point decoder in ``jax.checkpoint``
(the TPU analogue of ``torch.utils.checkpoint``; reference
``naive_renderer.py:59, 605-622``).

Emission-Absorption model (reference ``naive_renderer.py:196-325``):

    sigma_i = gain * softplus(opacity_mlp(...) + noise)
    nlt_i   = sum_{j<=i} sigma_j * delta_j          (negative log transmittance)
    T_i     = exp(-nlt_i),   w_i = T_{i-1} - T_i
    depth   = sum_i w_i * t_i,   feature = sum_i w_i * c_i
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .grid_sample import sample_grid_rep
from .misc_utils import (
    check_grid_and_color_grid,
    process_and_flatten_grid,
)
from .mlp_utils import DecoderParams, flattened_decoder_params_to_list
from .rand import get_sample_randn
from .rays import Rays


def _contract_pi(x: jnp.ndarray) -> jnp.ndarray:
    """MeRF coordinate contraction mapping R^3 into the [-1, 1] cube
    (reference ``naive_renderer.py:796-807``; MERF arXiv:2302.12249)."""
    n = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_abs = jnp.abs(x)
    safe_abs = jnp.where(x_abs > 0, x_abs, 1.0)
    safe_n = jnp.where(n > 0, n, 1.0)
    x_contract = jnp.where(
        n <= 1.0,
        x,
        jnp.where(
            jnp.abs(x_abs - n) <= 1e-7,
            (2.0 - 1.0 / safe_abs) * (x / safe_abs),
            x / safe_n,
        ),
    )
    return x_contract / 2.0


def _depth_inv_sphere(far, disparity_at_inf, n, step):
    """Disparity-spaced background depth schedule (reference
    ``naive_renderer.py:810-813``).

    Written as ``disp*f + (1-f)`` instead of ``(disp-1)*f + 1`` — the same
    value, but without the float32 catastrophic cancellation near f=1 that
    would make the fused (f32, on-device) and naive paths disagree at the
    far background samples.
    """
    frac_step = (jnp.asarray(step, jnp.float32) + 1.0) / n
    n_disp = disparity_at_inf * frac_step + (1.0 - frac_step)
    return far * (1.0 / n_disp)


def _depth_lin(near, far, n, step):
    """Linear depth schedule (reference ``shared/ray_util.py:55-58``)."""
    return near + (far - near) * (step / (n - 1)) if n > 1 else near


def _eval_mlp(vec, weights, biases):
    """Right-multiplying MLP with relu between layers, none at the end
    (reference ``naive_renderer.py:758-776``)."""
    n_l = len(weights)
    for l in range(n_l):
        vec = vec @ weights[l] + biases[l]
        if l < n_l - 1:
            vec = jax.nn.relu(vec)
    return vec


def _maybe_checkpoint(fn, checkpointing: bool):
    return jax.checkpoint(fn) if checkpointing else fn


def lightplane_eval_mlp(
    points: jnp.ndarray,  # [R, N, 3]
    grid_flat: jnp.ndarray,
    grid_sizes,
    ray_grid_idx: jnp.ndarray,
    decoder_params: DecoderParams,
    rays_encoding: jnp.ndarray,
    gain: float,
    mask_out_of_bounds_samples: bool = False,
    inject_opacity_noise: Optional[jnp.ndarray] = None,
    scaffold: Optional[jnp.ndarray] = None,
    color_grid_flat: Optional[jnp.ndarray] = None,
    color_grid_sizes=None,
    checkpointing: bool = False,
    contract_coords: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the decoder (grid sample + trunk/opacity/color MLPs) at
    ``points``; returns ``(opacity [R, N], color [R, N, C])``.

    Two decoder topologies (reference ``naive_renderer.py:328-501``):
      * single grid: grid -> trunk -> (opacity head, +ray_enc -> color head)
      * separate color grid ("relu-field"): relu(grid) -> opacity head,
        relu(color_grid) + ray_enc -> color head; no trunk.
    """
    (
        weights_trunk, biases_trunk,
        weights_opacity, biases_opacity,
        weights_color, biases_color,
    ) = flattened_decoder_params_to_list(
        decoder_params.mlp_params,
        decoder_params.n_hidden_trunk,
        decoder_params.n_hidden_opacity,
        decoder_params.n_hidden_color,
    )

    if contract_coords:
        points = _contract_pi(points)

    def _decoder(points, grid_flat, color_grid_flat, rays_encoding,
                 inject_opacity_noise, *mlp_chain):
        nw_t = len(weights_trunk)
        nw_o = len(weights_opacity)
        w_t, b_t = mlp_chain[:nw_t], mlp_chain[nw_t: 2 * nw_t]
        rest = mlp_chain[2 * nw_t:]
        w_o, b_o = rest[:nw_o], rest[nw_o: 2 * nw_o]
        rest = rest[2 * nw_o:]
        w_c, b_c = rest[: len(rest) // 2], rest[len(rest) // 2:]

        feature_sampled = sample_grid_rep(
            grid_flat, grid_sizes, points, ray_grid_idx,
            mask_out_of_bounds_samples,
        )
        if color_grid_flat is None:
            feature_trunk = jax.nn.relu(
                _eval_mlp(feature_sampled, w_t, b_t)
            )
            opacity_raw = _eval_mlp(feature_trunk, w_o, b_o)
            ray_feature = feature_trunk + rays_encoding[:, None]
            log_color = _eval_mlp(ray_feature, w_c, b_c)
        else:
            # relu-field: separate color grid, no trunk MLP
            assert nw_t == 0
            feature_sampled = jax.nn.relu(feature_sampled)
            color_sampled = jax.nn.relu(
                sample_grid_rep(
                    color_grid_flat, color_grid_sizes, points, ray_grid_idx,
                    mask_out_of_bounds_samples,
                )
            )
            opacity_raw = _eval_mlp(feature_sampled, w_o, b_o)
            log_color = _eval_mlp(
                color_sampled + rays_encoding[:, None], w_c, b_c
            )

        assert opacity_raw.shape[-1] == 1
        opacity_raw = opacity_raw[..., 0]
        if inject_opacity_noise is not None:
            opacity_raw = opacity_raw + inject_opacity_noise
        opacity = gain * jax.nn.softplus(opacity_raw)
        color = jax.nn.sigmoid(log_color)
        return opacity, color

    decoder = _maybe_checkpoint(_decoder, checkpointing)
    opacity, color = decoder(
        points, grid_flat, color_grid_flat, rays_encoding,
        inject_opacity_noise,
        *weights_trunk, *biases_trunk,
        *weights_opacity, *biases_opacity,
        *weights_color, *biases_color,
    )

    if scaffold is not None:
        scaffold_value = sample_grid_rep(
            scaffold.reshape(-1, 1),
            (tuple(scaffold.shape) + (1,),),
            points,
            ray_grid_idx,
            True,
            mode="nearest",
        )
        opacity = opacity * scaffold_value[..., 0]
        color = color * scaffold_value
    return opacity, color


def lightplane_eval_mlp_opacity_only(
    points: jnp.ndarray,
    grid_flat: jnp.ndarray,
    grid_sizes,
    ray_grid_idx: jnp.ndarray,
    decoder_params: DecoderParams,
    gain: float,
    mask_out_of_bounds_samples: bool = False,
    inject_opacity_noise: Optional[jnp.ndarray] = None,
    scaffold: Optional[jnp.ndarray] = None,
    checkpointing: bool = False,
    contract_coords: bool = False,
) -> jnp.ndarray:
    """Opacity-only decoder evaluation (used by scaffold computation;
    reference ``naive_renderer.py:504-602``)."""
    (
        weights_trunk, biases_trunk,
        weights_opacity, biases_opacity,
        _wc, _bc,
    ) = flattened_decoder_params_to_list(
        decoder_params.mlp_params,
        decoder_params.n_hidden_trunk,
        decoder_params.n_hidden_opacity,
        decoder_params.n_hidden_color,
    )
    if contract_coords:
        points = _contract_pi(points)
    feature_sampled = sample_grid_rep(
        grid_flat, grid_sizes, points, ray_grid_idx,
        mask_out_of_bounds_samples,
    )
    feature_trunk = jax.nn.relu(
        _eval_mlp(feature_sampled, weights_trunk, biases_trunk)
    )
    opacity_raw = _eval_mlp(feature_trunk, weights_opacity, biases_opacity)
    opacity_raw = opacity_raw[..., 0]
    if inject_opacity_noise is not None:
        opacity_raw = opacity_raw + inject_opacity_noise
    opacity = gain * jax.nn.softplus(opacity_raw)
    if scaffold is not None:
        scaffold_value = sample_grid_rep(
            scaffold.reshape(-1, 1),
            (tuple(scaffold.shape) + (1,),),
            points,
            ray_grid_idx,
            True,
            mode="nearest",
        )
        opacity = opacity * scaffold_value[..., 0]
    return opacity


def _ray_depths_and_deltas(
    rays: Rays, num_samples: int, num_samples_inf: int, disparity_at_inf: float
):
    """Per-ray sample depths + step sizes: ``num_samples`` equispaced in
    [near, far] then ``num_samples_inf`` disparity-spaced beyond far
    (reference ``naive_renderer.py:218-257``)."""
    lsp = jnp.linspace(0.0, 1.0, num_samples)
    depths = rays.near[:, None] + lsp[None, :] * (rays.far - rays.near)[:, None]
    if num_samples_inf > 0:
        sph = jnp.stack(
            [
                _depth_inv_sphere(
                    rays.far, disparity_at_inf, num_samples_inf, step
                )
                for step in range(num_samples_inf)
            ],
            axis=-1,
        )
        depths = jnp.concatenate([depths, sph], axis=-1)
    delta_one = (
        (rays.far - rays.near) / (num_samples - 1)
        if num_samples > 1
        else jnp.ones_like(rays.near)
    )
    delta = jnp.concatenate(
        [delta_one[:, None], jnp.diff(depths, axis=-1)], axis=-1
    )
    return depths, delta


def lightplane_renderer_naive(
    rays: Rays,
    grid: Union[Sequence[jnp.ndarray], jnp.ndarray],
    decoder_params: DecoderParams,
    # ------ config keys ------
    num_samples: int,
    gain: float,
    mask_out_of_bounds_samples: bool = False,
    num_samples_inf: int = 0,
    contract_coords: bool = False,
    inject_noise_sigma: float = 0.0,
    inject_noise_seed: Optional[int] = None,
    disparity_at_inf: float = 1e-5,
    scaffold: Optional[jnp.ndarray] = None,
    color_grid: Union[Sequence[jnp.ndarray], jnp.ndarray, None] = None,
    grid_sizes=None,
    color_grid_sizes=None,
    checkpointing: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Naive (materializing) Lightplane renderer; same numerics as the fused
    path, O(num_samples) memory.  Returns ``(expected depth,
    negative log transmittance, rendered features)`` per ray.

    See the reference docstring ``naive_renderer.py:61-196`` for argument
    semantics; differences here: grids may be grid-lists or flat 2-D tensors
    with *static* ``grid_sizes``, and the noise seed folds into the pure
    counter-based RNG (no global RNG state).
    """
    check_grid_and_color_grid(grid, color_grid, grid_sizes, color_grid_sizes)
    grid_flat, color_grid_flat, grid_sizes, color_grid_sizes = (
        process_and_flatten_grid(grid, color_grid, grid_sizes, color_grid_sizes)
    )

    num_rays = rays.directions.shape[0]
    tot_num_samples = num_samples + num_samples_inf

    if inject_noise_sigma > 0.0:
        if inject_noise_seed is None:
            raise ValueError(
                "inject_noise_seed must be given when inject_noise_sigma > 0"
            )
        inject_opacity_noise = (
            get_sample_randn(tot_num_samples, num_rays, inject_noise_seed)
            * inject_noise_sigma
        )
    else:
        inject_opacity_noise = None

    depths, delta = _ray_depths_and_deltas(
        rays, num_samples, num_samples_inf, disparity_at_inf
    )
    points = depths[..., None] * rays.directions[:, None]
    points = points + rays.origins[..., None, :]

    rays_encoding = rays.encoding
    if rays_encoding is None:
        rays_encoding = jnp.zeros(
            (num_rays, decoder_params.n_hidden_color[0]), grid_flat.dtype
        )

    opacity, color = lightplane_eval_mlp(
        points,
        grid_flat,
        grid_sizes,
        rays.grid_idx,
        decoder_params,
        rays_encoding,
        gain,
        mask_out_of_bounds_samples=mask_out_of_bounds_samples,
        inject_opacity_noise=inject_opacity_noise,
        scaffold=scaffold,
        color_grid_flat=color_grid_flat,
        color_grid_sizes=color_grid_sizes,
        checkpointing=checkpointing,
        contract_coords=contract_coords,
    )

    delta_opacity = opacity * delta
    delta_opacity = jnp.pad(delta_opacity, ((0, 0), (1, 0)))
    negative_log_transmittances = jnp.cumsum(delta_opacity, axis=-1)
    transmittance = jnp.exp(-negative_log_transmittances)
    rweights = -jnp.diff(transmittance, axis=-1)

    ray_length_render = jnp.sum(depths * rweights, axis=-1)
    feature_render = jnp.sum(color * rweights[..., None], axis=-2)
    negative_log_transmittance = negative_log_transmittances[..., -1]

    if decoder_params.color_chn < feature_render.shape[-1]:
        feature_render = feature_render[..., : decoder_params.color_chn]

    return ray_length_render, negative_log_transmittance, feature_render
