"""Fused, memory-efficient Lightplane renderer (the production path).

TPU-native re-design of the reference's Triton renderer
(``lightplane/lightplane_renderer.py:33-756`` + ``templates/renderer_fw.py``,
``templates/renderer_bw.py``):

* **Forward**: one ``lax.scan`` over ray-march steps.  Each step samples the
  grid-list, runs the tiny trunk/opacity/color MLPs (MXU matmuls), and updates
  the Emission-Absorption accumulators.  No ``[R, S, ...]`` intermediate is
  ever materialized — memory is O(R), independent of ``num_samples``.

* **Backward**: ``jax.custom_vjp`` whose bw pass marches *far -> near*,
  RECOMPUTING the per-step decoder forward and pulling gradients back through
  it with a per-step ``jax.vjp`` (the transpose of the gather is a scatter —
  the "splat" of the reference bw kernel, ``templates/renderer_bw.py:477-534``
  — without atomics, hence deterministic).  The transmittance is rewound
  analytically (``T_prev = exp(-(nlt - sigma*delta))``,
  ``renderer_bw.py:427-433``) and the Emission-Absorption adjoint is a
  running suffix sum, so only the *inputs* and the final negative log
  transmittance are saved — the reference's O(1)-in-samples memory trick
  (``lightplane_renderer.py:558-604``).

EA adjoint (s_j = sigma_j * delta_j, T_i = exp(-sum_{k<=i} s_k),
w_i = T_{i-1} - T_i, outputs depend on w_i and nlt_N):

    dL/ds_j = g_{w_j} * T_j  -  sum_{i>j} g_{w_i} * w_i  +  g_nlt

where ``g_{w_i} = g_depth * t_i + <g_feat, c_i>``; the suffix sum is
accumulated while marching backward.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .const import MIN_BLOCK_SIZE
from .grid_sample import sample_grid_rep
from .guards import assert_grads_finite
from .misc_utils import (
    check_grid_and_color_grid,
    process_and_flatten_grid,
)
from .mlp_utils import DecoderParams, flattened_decoder_params_to_list
from .naive_renderer import _contract_pi, _depth_inv_sphere
from .rand import int_to_randn
from .rays import Rays
import numpy as np


def zeros_with_vma(shape, dtype, ref):
    """Zeros whose shard_map varying-axes match ``ref``.

    Under ``shard_map`` (jax >= 0.9 vma type system), a ``lax.scan`` carry
    initialized with plain ``jnp.zeros`` is *unvarying* while the body's
    output (derived from sharded rays) is *varying over the mesh axis* —
    a carry type mismatch.  Adding a varying zero scalar derived from a
    sharded input fixes the carry type; outside shard_map this folds away.
    """
    z = ref.ravel()[0] * 0
    return jnp.zeros(shape, dtype) + z.astype(dtype)


def zero_cotangent(x):
    """Zero cotangent matching JAX's expectations (float0 for int/bool)."""
    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(
        x.dtype, jnp.bool_
    ):
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class _RenderCfg:
    """Static (trace-time) render configuration; hashable so it can be a
    ``nondiff_argnums`` argument of the custom-VJP core.  Plays the role of
    the reference's COG ``-D`` defines (``triton_src/__init__.py:266-307``) —
    each distinct cfg specializes a compiled executable via JAX's cache."""

    num_samples: int
    num_samples_inf: int
    gain: float
    mask_out_of_bounds_samples: bool
    contract_coords: bool
    disparity_at_inf: float
    inject_noise_sigma: float
    grid_sizes: tuple
    color_grid_sizes: Optional[tuple]
    n_hidden_trunk: tuple
    n_hidden_opacity: tuple
    n_hidden_color: tuple
    use_scaffold: bool
    scaffold_size: Optional[tuple]
    num_rays_noise: int  # R used in the noise counter scheme
    # Kernel matmul input dtype.  Internal and pinned to float32: the
    # public bfloat16 knob was REMOVED in round 3 after measurement — the
    # TPU's default matmul precision already rounds operands to bf16 with
    # f32 accumulation, so genuinely-bf16 inputs buy nothing on the MXU
    # (measured ~neutral end-to-end on v5e, 2026-08; the kernels are
    # bound by the serialized VPU phases between matmuls), and the W3
    # boxed-DMA path is compute- not bandwidth-bound, so halving box DMA
    # bytes does not help either.  f32-in/bf16-rounded-matmul is simply
    # the mode of this hardware.
    compute_dtype: str = "float32"
    # Stride of the per-(ray, step) noise counter scheme.  Normally the
    # total sample count; pinned explicitly when the background tail is
    # split off (``lightplane_renderer``) so the main pass keeps drawing
    # the same noise values as the unsplit oracle march.
    noise_sample_stride: Optional[int] = None
    # Rays per W2 kernel block — set to the pixel-tile area when rays are
    # tile-ordered with a non-default tile (``tile_ray_order``/
    # ``default_tile``), so one block spans exactly one tile.
    ray_block_rays: Optional[int] = None
    # W3 boxed-DMA window budget (WZ, WY, WX_MIN) cells, or None for the
    # module defaults (renderer_w3.W3_Z/W3_Y/W3_WX_MIN).  Tighter budgets
    # run faster but fit fewer camera rigs; :func:`suggest_w3_budget`
    # probes the tightest candidate whose window plan fits a given ray
    # batch (the runtime fit flag still guards correctness either way).
    w3_budget: Optional[Tuple[int, int, int]] = None
    # Rendered feature channels to return (< n_hidden_color[-1] crops
    # the zero-padded color lanes inside the kernel custom_vjp; None =
    # full width).  Pallas cores only.
    out_chn: Optional[int] = None

    @property
    def tot_num_samples(self):
        return self.num_samples + self.num_samples_inf

    @property
    def noise_stride(self):
        return self.noise_sample_stride or self.tot_num_samples


def _step_depth_delta(cfg: _RenderCfg, near, far, s: jnp.ndarray):
    """Depth t_s and step size delta_s at (traced) step index ``s``.

    Matches the oracle schedule (``naive_renderer.py:218-257``): equispaced
    in [near, far] for s < num_samples, then disparity-spaced to
    1/disparity_at_inf; delta_0 = (far-near)/(num_samples-1).
    """
    ns, ni = cfg.num_samples, cfg.num_samples_inf
    s_f = s.astype(near.dtype)

    def lin_depth(si):
        if ns > 1:
            return near + (far - near) * (si / (ns - 1))
        return near

    if ni > 0:
        def inf_depth(si):
            # si in [ns, ns+ni)
            return _depth_inv_sphere(far, cfg.disparity_at_inf, ni, si - ns)

        in_lin = s_f < ns
        t = jnp.where(in_lin, lin_depth(s_f), inf_depth(s_f))
        t_prev = jnp.where(
            s_f - 1 < ns, lin_depth(s_f - 1.0), inf_depth(s_f - 1.0)
        )
    else:
        t = lin_depth(s_f)
        t_prev = lin_depth(s_f - 1.0)

    if ns > 1:
        delta0 = (far - near) / (ns - 1)
    else:
        delta0 = jnp.ones_like(near)
    delta = jnp.where(s_f < 1, delta0, t - t_prev)
    return t, delta


def _step_noise(cfg: _RenderCfg, s, num_rays, seed):
    """Per-(ray, step) injected opacity noise via the counter RNG; same
    index scheme as the oracle (``rand.get_sample_randn``)."""
    S = cfg.noise_stride
    num_rays_pad = max(cfg.num_rays_noise, MIN_BLOCK_SIZE)
    i1 = S * jnp.arange(num_rays, dtype=jnp.int32) + s + 1
    i2 = i1 + num_rays_pad * S
    return int_to_randn(i1, i2, seed) * cfg.inject_noise_sigma


def _unpack_mlps(cfg: _RenderCfg, mlp_params):
    return flattened_decoder_params_to_list(
        mlp_params, cfg.n_hidden_trunk, cfg.n_hidden_opacity,
        cfg.n_hidden_color,
    )


def _step_decoder(
    cfg: _RenderCfg,
    pts,                # [R, 3] (already contracted if requested)
    grid_flat,
    color_grid_flat,
    mlp_params,
    rays_encoding,      # [R, C_enc]
    grid_idx,           # [R]
    scaffold,           # [B*D*H*W, 1] flat or None
    noise,              # [R] or None
):
    """Sample + decode one march step: returns (sigma [R], color [R, C]).

    The per-step equivalent of the reference fw kernel body
    (``templates/renderer_fw.py:209-363``).
    """
    (w_t, b_t, w_o, b_o, w_c, b_c) = _unpack_mlps(cfg, mlp_params)

    feat = sample_grid_rep(
        grid_flat, cfg.grid_sizes, pts, grid_idx,
        cfg.mask_out_of_bounds_samples,
    )
    if color_grid_flat is None:
        x = feat
        for l in range(len(w_t)):
            x = x @ w_t[l] + b_t[l]
            if l < len(w_t) - 1:
                x = jax.nn.relu(x)
        trunk = jax.nn.relu(x)
        x = trunk
        for l in range(len(w_o)):
            x = x @ w_o[l] + b_o[l]
            if l < len(w_o) - 1:
                x = jax.nn.relu(x)
        opacity_raw = x[..., 0]
        x = trunk + rays_encoding
        for l in range(len(w_c)):
            x = x @ w_c[l] + b_c[l]
            if l < len(w_c) - 1:
                x = jax.nn.relu(x)
        log_color = x
    else:
        # relu-field: separate color grid, no trunk MLP
        feat = jax.nn.relu(feat)
        cfeat = jax.nn.relu(
            sample_grid_rep(
                color_grid_flat, cfg.color_grid_sizes, pts, grid_idx,
                cfg.mask_out_of_bounds_samples,
            )
        )
        x = feat
        for l in range(len(w_o)):
            x = x @ w_o[l] + b_o[l]
            if l < len(w_o) - 1:
                x = jax.nn.relu(x)
        opacity_raw = x[..., 0]
        x = cfeat + rays_encoding
        for l in range(len(w_c)):
            x = x @ w_c[l] + b_c[l]
            if l < len(w_c) - 1:
                x = jax.nn.relu(x)
        log_color = x

    if noise is not None:
        opacity_raw = opacity_raw + noise
    sigma = cfg.gain * jax.nn.softplus(opacity_raw)
    color = jax.nn.sigmoid(log_color)

    if scaffold is not None:
        sc = sample_grid_rep(
            scaffold, (cfg.scaffold_size + (1,),), pts, grid_idx, True,
            mode="nearest",
        )
        sigma = sigma * sc[..., 0]
        color = color * sc
    return sigma, color


def _step_points(cfg, origins, directions, t):
    pts = origins + t[:, None] * directions
    if cfg.contract_coords:
        pts = _contract_pi(pts)
    return pts


# ---------------------------------------------------------------------------
# custom_vjp core
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_core(cfg: _RenderCfg, geom, diff):
    out, _ = _render_fwd_impl(cfg, geom, diff)
    return out


def _render_fwd_impl(cfg: _RenderCfg, geom, diff):
    directions, origins, near, far, grid_idx, scaffold, noise_seed = geom
    grid_flat, color_grid_flat, mlp_params, rays_encoding = diff
    R = directions.shape[0]
    C = cfg.n_hidden_color[-1]
    dtype = grid_flat.dtype

    def body(carry, s):
        nlt, depth_acc, feat_acc = carry
        t, delta = _step_depth_delta(cfg, near, far, s)
        pts = _step_points(cfg, origins, directions, t)
        noise = (
            _step_noise(cfg, s, R, noise_seed)
            if cfg.inject_noise_sigma > 0.0
            else None
        )
        sigma, color = _step_decoder(
            cfg, pts, grid_flat, color_grid_flat, mlp_params, rays_encoding,
            grid_idx, scaffold, noise,
        )
        nlt_new = nlt + sigma * delta
        w = jnp.exp(-nlt) - jnp.exp(-nlt_new)
        return (
            nlt_new,
            depth_acc + w * t,
            feat_acc + w[:, None] * color,
        ), None

    init = (
        zeros_with_vma((R,), dtype, near),
        zeros_with_vma((R,), dtype, near),
        zeros_with_vma((R, C), dtype, near),
    )
    (nlt, depth_acc, feat_acc), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.tot_num_samples)
    )
    return (depth_acc, nlt, feat_acc), nlt


def _render_fwd(cfg, geom, diff):
    out, nlt = _render_fwd_impl(cfg, geom, diff)
    return out, (geom, diff, nlt)


def _render_bwd(cfg: _RenderCfg, res, g_out):
    geom, diff, nlt_final = res
    directions, origins, near, far, grid_idx, scaffold, noise_seed = geom
    grid_flat, color_grid_flat, mlp_params, rays_encoding = diff
    g_depth, g_nlt, g_feat = g_out
    R = directions.shape[0]

    def body(carry, s):
        nlt_run, suffix, g_grid, g_cgrid, g_mlp, g_enc = carry
        t, delta = _step_depth_delta(cfg, near, far, s)
        pts = _step_points(cfg, origins, directions, t)
        noise = (
            _step_noise(cfg, s, R, noise_seed)
            if cfg.inject_noise_sigma > 0.0
            else None
        )

        def decoder_of_diff(grid_flat_, color_grid_flat_, mlp_params_, enc_):
            return _step_decoder(
                cfg, pts, grid_flat_, color_grid_flat_, mlp_params_, enc_,
                grid_idx, scaffold, noise,
            )

        (sigma, color), step_vjp = jax.vjp(
            decoder_of_diff, grid_flat, color_grid_flat, mlp_params,
            rays_encoding,
        )

        # transmittance rewind + EA adjoint
        s_s = sigma * delta
        nlt_prev = nlt_run - s_s
        T = jnp.exp(-nlt_run)          # T_s (includes step s)
        T_prev = jnp.exp(-nlt_prev)    # T_{s-1}
        w = T_prev - T
        g_w = g_depth * t + jnp.einsum("rc,rc->r", g_feat, color)
        g_s = g_w * T - suffix + g_nlt
        g_sigma = g_s * delta
        g_color = w[:, None] * g_feat

        d_grid, d_cgrid, d_mlp, d_enc = step_vjp((g_sigma, g_color))
        return (
            nlt_prev,
            suffix + g_w * w,
            g_grid + d_grid,
            None if g_cgrid is None else g_cgrid + d_cgrid,
            g_mlp + d_mlp,
            g_enc + d_enc,
        ), None

    init = (
        nlt_final,
        zeros_with_vma((R,), nlt_final.dtype, nlt_final),
        zeros_with_vma(grid_flat.shape, grid_flat.dtype, nlt_final),
        None if color_grid_flat is None else zeros_with_vma(
            color_grid_flat.shape, color_grid_flat.dtype, nlt_final
        ),
        zeros_with_vma(mlp_params.shape, mlp_params.dtype, nlt_final),
        zeros_with_vma(
            rays_encoding.shape, rays_encoding.dtype, nlt_final
        ),
    )
    steps = jnp.arange(cfg.tot_num_samples - 1, -1, -1)
    (_, _, g_grid, g_cgrid, g_mlp, g_enc), _ = jax.lax.scan(body, init, steps)

    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(
        (g_grid, g_cgrid, g_mlp, g_enc), "renderer(scan)"
    )


_render_core.defvjp(_render_fwd, _render_bwd)


# ---------------------------------------------------------------------------
# Pallas-kernel core (fused in-VMEM march; see kernels/renderer_pallas.py)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_core_pallas(cfg: _RenderCfg, geom, diff):
    from .kernels import renderer_pallas as rp

    return rp.pallas_render_fwd(cfg, geom, diff)


def _render_fwd_pallas(cfg, geom, diff):
    from .kernels import renderer_pallas as rp

    out = rp.pallas_render_fwd(cfg, geom, diff)
    return out, (geom, diff, out[1])


def _render_bwd_pallas(cfg, res, g_out):
    from .kernels import renderer_pallas as rp

    geom, diff, nlt_final = res
    g_grid, g_cgrid, g_mlp, g_enc = rp.pallas_render_bwd(
        cfg, geom, diff, nlt_final, g_out
    )
    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(
        (g_grid, g_cgrid, g_mlp, g_enc), "renderer(pallas)"
    )


_render_core_pallas.defvjp(_render_fwd_pallas, _render_bwd_pallas)


def _render_tail(cfg: _RenderCfg, geom, diff, nlt_mid):
    """Differentiable background-sample tail: steps ``[num_samples,
    num_samples + num_samples_inf)``, chained from the main pass's final
    negative log transmittance.

    Background depths march to ``t ~ 1/disparity_at_inf`` (1e5 at the
    default), so the fused cores' analytic transmittance rewind
    (``nlt_prev = nlt - sigma*delta``) subtracts enormous terms and
    corrupts every earlier step's transmittance — measured 25% mean
    relative grid-gradient error against an f64 oracle
    (``tests/test_renderer_interactions.py``).  This tail therefore runs
    as a plain ``lax.scan`` under standard JAX autodiff: transmittance is
    accumulated FORWARD only, which is well-conditioned, at the cost of
    O(num_samples_inf * R) checkpointed residuals (tails are small; the
    reference default is 0 and typical use is <= 32).  The reference
    handles the tail inside its rewind bw kernel
    (``templates/renderer_bw.py:427-433``) and inherits the
    ill-conditioning; this is a deliberate accuracy improvement.

    Geometry gradients are stopped to match the fused cores' semantics
    (the reference returns no ray-geometry gradients,
    ``lightplane_renderer.py:613-756``).
    """
    directions, origins, near, far, grid_idx, scaffold, noise_seed = geom
    directions, origins, near, far = map(
        jax.lax.stop_gradient, (directions, origins, near, far)
    )
    if scaffold is not None:
        scaffold = jax.lax.stop_gradient(scaffold)
    grid_flat, color_grid_flat, mlp_params, rays_encoding = diff
    R = directions.shape[0]
    C = cfg.n_hidden_color[-1]

    def decoder(pts, noise, g, cg, mp, enc):
        return _step_decoder(
            cfg, pts, g, cg, mp, enc, grid_idx, scaffold, noise
        )

    decoder = jax.checkpoint(decoder)

    def body(carry, s):
        nlt, depth_acc, feat_acc = carry
        t, delta = _step_depth_delta(cfg, near, far, s)
        pts = _step_points(cfg, origins, directions, t)
        noise = (
            _step_noise(cfg, s, R, noise_seed)
            if cfg.inject_noise_sigma > 0.0
            else None
        )
        sigma, color = decoder(pts, noise, grid_flat, color_grid_flat,
                               mlp_params, rays_encoding)
        nlt_new = nlt + sigma * delta
        w = jnp.exp(-nlt) - jnp.exp(-nlt_new)
        return (
            nlt_new,
            depth_acc + w * t,
            feat_acc + w[:, None] * color,
        ), None

    init = (
        nlt_mid,
        zeros_with_vma((R,), nlt_mid.dtype, nlt_mid),
        zeros_with_vma((R, C), nlt_mid.dtype, nlt_mid),
    )
    steps = jnp.arange(cfg.num_samples, cfg.tot_num_samples)
    (nlt, depth_add, feat_add), _ = jax.lax.scan(body, init, steps)
    return depth_add, nlt, feat_add


def _image_tile_reorder(rays, R, image_size, grid_sizes, color_grid_sizes,
                        tile_rays):
    """Tile-reorder a raster-order image ray batch (see
    ``lightplane_renderer(image_size=...)``).  Returns
    ``(rays, inverse_permutation_or_None, tile_rays)``."""
    if image_size is None:
        return rays, None, tile_rays
    import numpy as np

    from .rays import default_tile, tile_ray_order

    h, w = int(image_size[0]), int(image_size[1])
    if R != h * w:
        raise ValueError(
            f"image_size {image_size} does not match the ray count "
            f"({R} != {h * w})"
        )
    tile = default_tile(h, w)
    # beyond-VMEM grids run the W3 boxed-DMA kernels, whose ray
    # blocks are sized for compact square-ish pixel tiles
    from .kernels.renderer_pallas import MAX_CELLS_PER_GRID

    all_sizes = list(grid_sizes) + list(color_grid_sizes or ())
    if any(
        int(np.prod(gs[:-1])) > MAX_CELLS_PER_GRID
        for gs in all_sizes
    ):
        from .kernels.renderer_w3 import W3_TILE

        if h % W3_TILE[0] == 0 and w % W3_TILE[1] == 0:
            tile = W3_TILE
    inv = None
    order_np, inv_np = tile_ray_order(h, w, tile=tile)
    if not np.array_equal(order_np, np.arange(R)):
        rays = rays[jnp.asarray(order_np)]
        inv = jnp.asarray(inv_np)
        if tile_rays is None:
            tile_rays = tile[0] * tile[1]
    return rays, inv, tile_rays


# Candidate (WZ, WY, WX_MIN) window budgets, tightest first.  The round-4
# on-chip sweep at the 64^3 x 32ch / 256^2 / 256-sample benchmark measured
# 428k rays/s fwd+bwd at (12, 16, 12) vs 307k at the (16, 24, 16) default
# (scratch/PERF_NOTES.md) — tighter budgets are faster but fit fewer
# camera rigs.  The round-5 CPU fit sweep over the 120-pose orbit
# (scratch/sweep_w3_budget_fit.py — the planner's fit flags are pure
# host math, backend-independent) mapped the frontier: WX=12 is what
# breaks the 48/120 poses, while (12, 16, 16) fits ALL 120 at HALF the
# default's zy*wxC matmul volume (98304 vs 196608) and (16, 16, 16)
# fits all at 2/3.
W3_BUDGET_CANDIDATES = (
    (12, 16, 12),
    (12, 16, 16),
    (16, 16, 16),
    (16, 24, 16),
    (24, 32, 24),
)


def suggest_w3_budget(
    rays: Rays,
    grid,
    decoder_params: DecoderParams,
    num_samples: int,
    num_samples_inf: int = 0,
    disparity_at_inf: float = 1e-5,
    contract_coords: bool = False,
    color_grid=None,
    grid_sizes=None,
    color_grid_sizes=None,
    tile_rays: Optional[int] = None,
    image_size: Optional[Tuple[int, int]] = None,
    candidates=W3_BUDGET_CANDIDATES,
) -> Optional[Tuple[int, int, int]]:
    """Tightest W3 window budget whose plan fits this ray batch.

    Probes each candidate ``(WZ, WY, WX_MIN)`` (cheapest first) against
    the W3 window planner's fit flags for BOTH the forward and backward
    chunkings, and returns the first that fits — pass it as
    ``lightplane_renderer(..., w3_budget=...)``.  Returns ``None`` when
    the config is not a W3 (beyond-VMEM) config or no candidate fits
    (use the defaults; the runtime fit flag still guards correctness).

    EAGER-ONLY: the fit flags are evaluated concretely, so this cannot be
    called under ``jit``.  The intended pattern is one probe per camera
    rig — or per batch, since each distinct budget is one compiled
    variant and the candidate ladder bounds the variant count.
    """
    from .kernels import renderer_pallas as rp
    from .kernels import renderer_w3 as rw3

    if grid_sizes is None:
        gl = grid if isinstance(grid, (list, tuple)) else [grid]
        grid_sizes = tuple(tuple(int(s) for s in g.shape) for g in gl)
    else:
        grid_sizes = tuple(tuple(int(s) for s in gs) for gs in grid_sizes)
    if color_grid_sizes is None and color_grid is not None:
        cgl = (
            color_grid if isinstance(color_grid, (list, tuple))
            else [color_grid]
        )
        color_grid_sizes = tuple(
            tuple(int(s) for s in g.shape) for g in cgl
        )
    elif color_grid_sizes is not None:
        color_grid_sizes = tuple(
            tuple(int(s) for s in gs) for gs in color_grid_sizes
        )

    # Channel counts as the kernels see them: the FORWARD folds trunk
    # layer 1 into the sampling matmul (pallas_render_fwd's t1 fold), so
    # its geos use the folded width; the BACKWARD needs the raw sampled
    # features for dW_t1 and builds its geos from the UNFOLDED channel
    # count — the two passes can have different lane alignments/window
    # widths, so each is probed with its own geos.
    c_raw = int(grid_sizes[0][-1])
    c_fw = c_raw
    if color_grid_sizes is None and len(decoder_params.n_hidden_trunk) > 1:
        c_fw = int(decoder_params.n_hidden_trunk[1])
    c_color = (
        int(color_grid_sizes[0][-1]) if color_grid_sizes else None
    )

    R = rays.directions.shape[0]
    rays, _inv, tile_rays = _image_tile_reorder(
        rays, R, image_size, grid_sizes, color_grid_sizes, tile_rays
    )

    ordered = sorted(candidates, key=lambda b: b[0] * b[1] * b[2])
    geom = (
        rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), None,
        jnp.asarray(0, jnp.int32),
    )
    for budget in ordered:
        # The real render splits the background tail off the fused cores
        # (lightplane_renderer runs the W3 kernels with num_samples_inf=0
        # and the tail as a plain scan), so the probe plans the MAIN
        # march only — background samples never constrain the fit.
        cfg = _RenderCfg(
            num_samples=int(num_samples),
            num_samples_inf=0,
            gain=1.0,
            mask_out_of_bounds_samples=False,
            contract_coords=bool(contract_coords),
            disparity_at_inf=float(disparity_at_inf),
            inject_noise_sigma=0.0,
            grid_sizes=grid_sizes,
            color_grid_sizes=color_grid_sizes,
            n_hidden_trunk=decoder_params.n_hidden_trunk,
            n_hidden_opacity=decoder_params.n_hidden_opacity,
            n_hidden_color=decoder_params.n_hidden_color,
            use_scaffold=False,
            scaffold_size=None,
            num_rays_noise=R,
            ray_block_rays=int(tile_rays) if tile_rays else None,
            w3_budget=tuple(int(x) for x in budget),
        )
        if not rp._w3_mode(cfg):
            return None  # not a W3 config at all
        RB = rp._ray_block(cfg)
        enc = jnp.zeros((R, cfg.n_hidden_color[0]), jnp.float32)
        arrs, _seed, _R, _R_pad = rp._ray_inputs(cfg, geom, enc, RB)
        o_p, d_p, near_p, far_p, gsel_p = rp._plan_cols(cfg, arrs)
        fits = True
        for bw, c_main in ((False, c_fw), (True, c_raw)):
            pair = rw3.w3_geos(cfg, c_main, c_color)
            if pair is None:
                fits = False  # alignment-infeasible at this channel count
                break
            w3geos = list(pair[0]) + list(pair[1])
            K = rp._march_chunk(cfg, bw=bw)
            _w0, fit = rw3.w3_plan(
                cfg, o_p, d_p, near_p, far_p, K, bw, w3geos, RB,
                gsel=gsel_p,
            )
            fits = fits and bool(fit)
            if not fits:
                break
        if fits:
            return tuple(int(x) for x in budget)
    return None


def _use_pallas(cfg, impl: str) -> bool:
    from .kernels import renderer_pallas as rp

    if impl == "pallas":
        return True
    if impl != "auto":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return rp.pallas_renderer_supported(cfg)


# ---------------------------------------------------------------------------
# Public functional API
# ---------------------------------------------------------------------------


def lightplane_renderer(
    rays: Rays,
    grid: Union[Sequence[jnp.ndarray], jnp.ndarray],
    decoder_params: DecoderParams,
    # ------ config keys ------
    num_samples: int,
    gain: float,
    num_samples_inf: int = 0,
    mask_out_of_bounds_samples: bool = False,
    contract_coords: bool = False,
    disparity_at_inf: float = 1e-5,
    inject_noise_sigma: float = 0.0,
    inject_noise_seed: Optional[int] = None,
    scaffold: Optional[jnp.ndarray] = None,
    color_grid: Union[Sequence[jnp.ndarray], jnp.ndarray, None] = None,
    grid_sizes=None,
    color_grid_sizes=None,
    impl: str = "auto",
    tile_rays: Optional[int] = None,
    image_size: Optional[Tuple[int, int]] = None,
    w3_budget: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused differentiable Emission-Absorption renderer.

    Functionally identical to :func:`lightplane_renderer_naive` but with
    O(1)-in-``num_samples`` memory in both passes (streamed forward scan +
    reverse-march recompute backward).  See the oracle's docstring for the
    argument semantics (mirrors reference ``lightplane_renderer.py:33-211``).

    ``impl`` selects the fused implementation: ``"auto"`` (Pallas TPU
    kernels when supported, else XLA scan), ``"pallas"``, or ``"scan"``.

    ``image_size=(height, width)`` declares that ``rays`` are a full
    raster-order image: the call tile-reorders them internally
    (:func:`tile_ray_order`, adaptive tile shape) so the packed 2D-window
    kernels engage, and inverse-scatters the per-ray outputs — raster
    callers get tile-order throughput without touching their ray layout
    (the :class:`LightplaneRenderer` module's ``image_size`` option,
    lifted to the functional API).  With ``inject_noise_sigma`` the noise
    stream follows the internal tile order (as in the module).

    Returns:
        ray_length_render: ``[R]`` expected ray-termination length.
        negative_log_transmittance: ``[R]``.
        feature_render: ``[R, color_chn]`` rendered features.
    """
    check_grid_and_color_grid(grid, color_grid, grid_sizes, color_grid_sizes)
    grid_flat, color_grid_flat, grid_sizes, color_grid_sizes = (
        process_and_flatten_grid(grid, color_grid, grid_sizes, color_grid_sizes)
    )
    R = rays.directions.shape[0]

    rays, inv, tile_rays = _image_tile_reorder(
        rays, R, image_size, grid_sizes, color_grid_sizes, tile_rays
    )

    if inject_noise_sigma > 0.0 and inject_noise_seed is None:
        raise ValueError(
            "inject_noise_seed must be given when inject_noise_sigma > 0"
        )

    cfg = _RenderCfg(
        num_samples=int(num_samples),
        num_samples_inf=int(num_samples_inf),
        gain=float(gain),
        mask_out_of_bounds_samples=bool(mask_out_of_bounds_samples),
        contract_coords=bool(contract_coords),
        disparity_at_inf=float(disparity_at_inf),
        inject_noise_sigma=float(inject_noise_sigma),
        grid_sizes=grid_sizes,
        color_grid_sizes=color_grid_sizes,
        n_hidden_trunk=decoder_params.n_hidden_trunk,
        n_hidden_opacity=decoder_params.n_hidden_opacity,
        n_hidden_color=decoder_params.n_hidden_color,
        use_scaffold=scaffold is not None,
        scaffold_size=(
            tuple(int(x) for x in scaffold.shape)
            if scaffold is not None
            else None
        ),
        num_rays_noise=R,
        ray_block_rays=int(tile_rays) if tile_rays else None,
        w3_budget=(
            tuple(int(x) for x in w3_budget)
            if w3_budget is not None else None
        ),
    )

    rays_encoding = rays.encoding
    if rays_encoding is None:
        rays_encoding = jnp.zeros(
            (R, cfg.n_hidden_color[0]), grid_flat.dtype
        )

    scaffold_flat = (
        scaffold.reshape(-1, 1) if scaffold is not None else None
    )
    noise_seed = jnp.asarray(
        inject_noise_seed if inject_noise_seed is not None else 0,
        dtype=jnp.int32,
    )

    geom = (
        rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), scaffold_flat, noise_seed,
    )
    diff = (grid_flat, color_grid_flat, decoder_params.mlp_params,
            rays_encoding)

    if cfg.num_samples_inf > 0 and cfg.num_samples > 0:
        # Split the background tail out of the rewind cores (see
        # _render_tail): the main march keeps the O(1)-in-samples rewind
        # where it is well-conditioned, the tail runs forward-accumulated
        # autodiff.  noise_sample_stride pins the noise counter scheme to
        # the unsplit total so draws stay oracle-identical.
        cfg_main = dataclasses.replace(
            cfg, num_samples_inf=0,
            noise_sample_stride=cfg.tot_num_samples,
        )
        core = (
            _render_core_pallas if _use_pallas(cfg_main, impl)
            else _render_core
        )
        depth, nlt_mid, feat = core(cfg_main, geom, diff)
        depth_t, nlt, feat_t = _render_tail(cfg, geom, diff, nlt_mid)
        depth = depth + depth_t
        feat = feat + feat_t
    else:
        use_pallas = _use_pallas(cfg, impl)
        cfg_run = cfg
        if use_pallas and decoder_params.color_chn < cfg.n_hidden_color[-1]:
            # crop the zero-padded color channels INSIDE the custom_vjp:
            # an outside slice keeps the full-width [R, C_col] features
            # alive into the loss and its transpose re-materializes a
            # zero-padded [R, C_col] cotangent — two avoidable
            # whole-ray-set buffers in batched megapixel renders
            cfg_run = dataclasses.replace(
                cfg, out_chn=int(decoder_params.color_chn)
            )
        core = _render_core_pallas if use_pallas else _render_core
        depth, nlt, feat = core(cfg_run, geom, diff)

    if decoder_params.color_chn < feat.shape[-1]:
        feat = feat[..., : decoder_params.color_chn]
    if inv is not None:
        depth, nlt, feat = depth[inv], nlt[inv], feat[inv]
    return depth, nlt, feat
