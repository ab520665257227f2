"""Fused, memory-efficient Lightplane splatter (the production 2D->3D path).

TPU-native re-design of the reference's Triton splatter
(``lightplane/lightplane_splatter.py:31-700`` + ``templates/splatter_fw.py``,
``templates/splatter_bw.py``):

* **Forward**: one ``lax.scan`` over march steps accumulating the splat into
  the flat output grid held in the scan carry (deterministic scatter-add —
  the atomics-free TPU replacement for ``tl.atomic_add``,
  ``grid_sample_util.py:40-99``).  Features and unit "collision" weights are
  splatted together in one pass (the reference launches a second C=1 kernel,
  ``lightplane_splatter.py:507-539``), then the output is
  ``features / clamp(weights, 1e-5)``.

* **Backward** (``jax.custom_vjp``): the adjoint of a splat is a *gather* —
  march again and sample the normalized incoming gradient at each step
  (``templates/splatter_bw.py:75-180``).  As in the reference, the gradient
  through the weight-grid denominator is deliberately not propagated
  (``lightplane_splatter.py:608``) — and indeed carries no gradient w.r.t.
  any differentiable input since the collision features are constant ones.
  With an MLP + ``input_grid``, the per-step fused feature + MLP forward is
  recomputed and gradients pulled back through a per-step ``jax.vjp``
  (``templates/splatter_bw.py:183-394``).

Only the inputs and the [V, 1] weight grid are saved between passes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .grid_sample import sample_grid_rep, splat_grid_rep
from .guards import assert_grads_finite
from .misc_utils import (
    check_grid_and_color_grid,
    process_and_flatten_grid,
    unflatten_grid,
)
from .mlp_utils import SplatterParams, _flattened_one_mlp_params_to_list
from .naive_renderer import _contract_pi
from .naive_splatter import WEIGHT_GRID_EPS
from .rays import Rays
from .renderer import _step_depth_delta, zero_cotangent, zeros_with_vma


@dataclasses.dataclass(frozen=True)
class _SplatCfg:
    num_samples: int
    num_samples_inf: int
    mask_out_of_bounds_samples: bool
    contract_coords: bool
    disparity_at_inf: float
    output_grid_sizes: tuple       # ((B, D, H, W, C), ...)
    input_grid_sizes: Optional[tuple]
    n_hidden: tuple                # () if no MLP
    # ray count of the call (static), for sample-count-scaled layout
    # choices (sorted_geos' CPAD mode); None = unknown
    total_rays: Optional[int] = None

    @property
    def tot_num_samples(self):
        return self.num_samples + self.num_samples_inf

    @property
    def v_total(self):
        return sum(int(np.prod(gs[:-1])) for gs in self.output_grid_sizes)

    @property
    def weight_grid_sizes(self):
        return tuple(gs[:-1] + (1,) for gs in self.output_grid_sizes)

    @property
    def out_chn(self):
        return int(self.output_grid_sizes[0][-1])


def _step_fused_feature(cfg: _SplatCfg, pts, splatting_feature,
                        input_grid_flat, mlp_params, grid_idx):
    """The per-step splat vector: either the raw per-ray feature, or
    MLP(input_grid[x] + splatting_feature) (reference
    ``templates/splatter_fw.py:168-309``)."""
    if len(cfg.n_hidden) == 0:
        return splatting_feature
    weights, biases = _flattened_one_mlp_params_to_list(
        mlp_params, cfg.n_hidden
    )
    sampled = sample_grid_rep(
        input_grid_flat, cfg.input_grid_sizes, pts, grid_idx,
        cfg.mask_out_of_bounds_samples,
    )
    x = sampled + splatting_feature
    for l in range(len(weights)):
        x = x @ weights[l] + biases[l]
        if l < len(weights) - 1:
            x = jax.nn.relu(x)
    return x


def _march_geometry(cfg, geom, s):
    directions, origins, near, far, grid_idx = geom[:5]
    t, _ = _step_depth_delta(cfg, near, far, s)
    pts = origins + t[:, None] * directions
    if cfg.contract_coords:
        pts = _contract_pi(pts)
    return pts


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_core(cfg: _SplatCfg, geom, diff):
    """Raw (un-normalized) splat accumulators ``(feat_grid, weight_grid)``.

    Exposed un-normalized so (a) the no-gradient-through-the-denominator
    semantics of the reference (``lightplane_splatter.py:608``) fall out of
    the custom VJP ignoring the weight cotangent (the unit collision
    features carry no dependence on any differentiable input anyway), and
    (b) multi-chip data parallelism can ``psum`` the linear accumulators
    before normalizing.
    """
    return _splat_fwd_impl(cfg, geom, diff)


def _splat_fwd_impl(cfg: _SplatCfg, geom, diff):
    directions, origins, near, far, grid_idx, valid_mask = geom
    splatting_feature, input_grid_flat, mlp_params = diff
    dtype = splatting_feature.dtype

    def body(carry, s):
        feat_grid, w_grid = carry
        pts = _march_geometry(cfg, geom, s)
        vec = _step_fused_feature(
            cfg, pts, splatting_feature, input_grid_flat, mlp_params, grid_idx
        )
        vec = vec * valid_mask[:, None]
        feat_grid = splat_grid_rep(
            vec, feat_grid, cfg.output_grid_sizes, pts, grid_idx,
            cfg.mask_out_of_bounds_samples,
        )
        w_grid = splat_grid_rep(
            valid_mask[:, None], w_grid, cfg.weight_grid_sizes, pts, grid_idx,
            cfg.mask_out_of_bounds_samples,
        )
        return (feat_grid, w_grid), None

    init = (
        zeros_with_vma((cfg.v_total, cfg.out_chn), dtype, near),
        zeros_with_vma((cfg.v_total, 1), dtype, near),
    )
    (feat_grid, w_grid), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.tot_num_samples)
    )
    return feat_grid, w_grid


def _splat_fwd(cfg, geom, diff):
    out = _splat_fwd_impl(cfg, geom, diff)
    return out, (geom, diff)


def _splat_bwd_gather_scan(cfg: _SplatCfg, geom, g_feat_grid):
    """Scan-path adjoint gather for the no-MLP splatter: march and sample
    the incoming gradient grid (shared by the scan core's bwd and the
    big-grid core's fallback branch)."""
    directions, origins, near, far, grid_idx, valid_mask = geom

    def body(g_feat, s):
        pts = _march_geometry(cfg, geom, s)
        g_vec = sample_grid_rep(
            g_feat_grid, cfg.output_grid_sizes, pts, grid_idx,
            cfg.mask_out_of_bounds_samples,
        ) * valid_mask[:, None]
        return g_feat + g_vec, None

    init = zeros_with_vma(
        (directions.shape[0], cfg.out_chn), g_feat_grid.dtype, near
    )
    g_feat, _ = jax.lax.scan(body, init, jnp.arange(cfg.tot_num_samples))
    return g_feat


def _splat_bwd(cfg: _SplatCfg, res, g_out):
    geom, diff = res
    directions, origins, near, far, grid_idx, valid_mask = geom
    splatting_feature, input_grid_flat, mlp_params = diff

    # weight-grid cotangent ignored: the unit collision features do not
    # depend on any differentiable input (reference lightplane_splatter.py:608
    # semantics)
    g_feat_grid, _g_w_grid = g_out

    def body(carry, s):
        g_feat, g_igrid, g_mlp = carry
        pts = _march_geometry(cfg, geom, s)
        # adjoint of the splat is a gather of the incoming gradient
        g_vec = sample_grid_rep(
            g_feat_grid, cfg.output_grid_sizes, pts, grid_idx,
            cfg.mask_out_of_bounds_samples,
        ) * valid_mask[:, None]

        if len(cfg.n_hidden) == 0:
            return (g_feat + g_vec, g_igrid, g_mlp), None

        def fused_of_diff(splatting_feature_, input_grid_flat_, mlp_params_):
            return _step_fused_feature(
                cfg, pts, splatting_feature_, input_grid_flat_, mlp_params_,
                grid_idx,
            )

        _, step_vjp = jax.vjp(
            fused_of_diff, splatting_feature, input_grid_flat, mlp_params
        )
        d_feat, d_igrid, d_mlp = step_vjp(g_vec)
        return (g_feat + d_feat, g_igrid + d_igrid, g_mlp + d_mlp), None

    init = (
        zeros_with_vma(
            splatting_feature.shape, splatting_feature.dtype, near
        ),
        None if input_grid_flat is None else zeros_with_vma(
            input_grid_flat.shape, input_grid_flat.dtype, near
        ),
        None if mlp_params is None else zeros_with_vma(
            mlp_params.shape, mlp_params.dtype, near
        ),
    )
    (g_feat, g_igrid, g_mlp), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.tot_num_samples)
    )
    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(
        (g_feat, g_igrid, g_mlp), "splatter(scan)"
    )


_splat_core.defvjp(_splat_fwd, _splat_bwd)


# ---------------------------------------------------------------------------
# Big-grid core: HBM-resident boxed-DMA kernel with scan fallback
# (see kernels/splatter_big.py)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_core_big(cfg: _SplatCfg, geom, diff):
    out, _ = _splat_big_fwd_impl(cfg, geom, diff)
    return out


def _big_fallback_is_sorted(cfg: _SplatCfg) -> bool:
    """When the boxed planner's runtime fit flag fails (incoherent ray
    order), fall back to the order-independent sorted kernel where it
    applies — the XLA-scatter scan is ~1000x slower on TPU."""
    from .kernels import splatter_sorted as ss

    return ss.sorted_splat_supported(cfg)


def _splat_big_fwd_impl(cfg: _SplatCfg, geom, diff):
    from .kernels import splatter_big as sb

    arrs, _valid, _R, _R_pad = sb._ray_arrs(geom, diff[0])
    w0, fits, K, n_chunks = sb.box_plan(
        cfg, arrs[0], arrs[1], arrs[2][:, 0], arrs[3][:, 0],
        sb.grid_infos(cfg.output_grid_sizes),
    )
    if _big_fallback_is_sorted(cfg):
        fallback = lambda: _sorted_fwd_impl(cfg, geom, diff)
    else:
        fallback = lambda: _splat_fwd_impl(cfg, geom, diff)
    out = jax.lax.cond(
        fits,
        lambda: sb.big_splat_fwd(cfg, geom, diff, w0, K, n_chunks),
        fallback,
    )
    return out, (w0, fits, K, n_chunks)


def _splat_big_fwd(cfg, geom, diff):
    out, plan = _splat_big_fwd_impl(cfg, geom, diff)
    return out, (geom, plan)


def _splat_big_bwd(cfg: _SplatCfg, res, g_out):
    from .kernels import splatter_big as sb

    geom, (w0, fits, K, n_chunks) = res
    g_feat_grid, _g_w_grid = g_out  # weight cotangent ignored (see above)
    if _big_fallback_is_sorted(cfg):
        fallback = lambda: _sorted_bwd_impl(cfg, geom, g_feat_grid)
    else:
        fallback = lambda: _splat_bwd_gather_scan(cfg, geom, g_feat_grid)
    g_enc = jax.lax.cond(
        fits,
        lambda: sb.big_splat_bwd(cfg, geom, g_feat_grid, w0, K, n_chunks),
        fallback,
    )
    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(
        (g_enc, None, None), "splatter(big)"
    )


_splat_core_big.defvjp(_splat_big_fwd, _splat_big_bwd)


# ---------------------------------------------------------------------------
# Sorted-splat core: order-independent big-grid kernel
# (see kernels/splatter_sorted.py)
# ---------------------------------------------------------------------------

# samples per sorted-splat launch; larger ray sets are split into EQUAL ray
# chunks scanned over one threaded HBM accumulator.  Equal shapes + lax.scan
# keep exactly one chunk's sort/stream buffers live (round 1's unequal
# unrolled chunks defeated XLA buffer reuse -> 17.6 GiB temp -> OOM on the
# 16 GB v5e at the reference 160^3x64 splatter benchmark config).  The
# chunk size is the peak-HBM knob: the transient per-chunk value and
# gradient streams are ~[chunk_samples x 128] f32 each, so halving the
# chunk halves them (at a small fixed-overhead cost per extra chunk).
import os as _os

_SORTED_CHUNK_SAMPLES = int(_os.environ.get(
    "LIGHTPLANE_SORTED_CHUNK_SAMPLES", 4_194_304
))


def _sorted_chunk_shape(R: int, S: int, mlp: bool = False,
                        n_grids: int = 1):
    # MLP configs halve the chunk: the fused per-sample feature stream and
    # its VJP intermediates add several [chunk_N, C] f32 buffers.  Multi-
    # grid lists hold one plan's tables per sub-grid at a time.
    cap = _SORTED_CHUNK_SAMPLES // (2 if mlp else 1) // max(1, n_grids)
    n_chunks = max(1, -(-(R * S) // cap))
    chunk_r = -(-R // n_chunks)
    return n_chunks, chunk_r


def _pad_rows(a, n):
    if a.shape[0] == n:
        return a
    return jnp.pad(a, ((0, n - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def _fused_sample_chunk(cfg: _SplatCfg, geom_c, encoding, input_grid_flat,
                        mlp_params):
    """Per-sample fused splat vectors for one ray chunk: ``[R*S, C]``.

    TPU-native replacement for the reference's in-kernel per-step
    sample + MLP (``templates/splatter_fw.py:168-309``): the whole chunk's
    sample stream is gathered from the input grid in one batched corner
    gather and pushed through the splatter MLP as one large matmul chain
    on the MXU — FLOP-identical to the fused kernel, at MXU-friendly
    batch shapes instead of 16-ray register blocks.  Coordinates reuse the
    sorted plan's exact elementwise expressions
    (``splatter_sorted._march_points``) so values and sort keys
    describe identical points.  Invalid (chunk-padding) rays are zeroed
    *here* so the custom VJP's cotangent flows through the mask.
    """
    from .kernels import splatter_sorted as ss

    directions, origins, near, far, grid_idx, valid = geom_c
    R = directions.shape[0]
    S = cfg.tot_num_samples
    step = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (R, S))
    pts = ss._march_points(
        cfg, origins[:, None, :], directions[:, None, :],
        near[:, None], far[:, None], step,
    )
    pts = pts.reshape(R * S, 3)
    gi = jnp.broadcast_to(grid_idx[:, None], (R, S)).reshape(R * S)
    sampled = sample_grid_rep(
        input_grid_flat, cfg.input_grid_sizes, pts, gi,
        cfg.mask_out_of_bounds_samples,
    )
    x = sampled + jnp.broadcast_to(
        encoding[:, None, :], (R, S, encoding.shape[-1])
    ).reshape(R * S, -1)
    weights, biases = _flattened_one_mlp_params_to_list(
        mlp_params, cfg.n_hidden
    )
    for l in range(len(weights)):
        x = x @ weights[l] + biases[l]
        if l < len(weights) - 1:
            x = jax.nn.relu(x)
    return x * jnp.broadcast_to(valid[:, None], (R, S)).reshape(R * S, 1)


# plan keys the backward consumes (``sorted_splat_bwd``): the bin coord
# streams + group table for the gather kernel, and the un-sort map
_PLAN_RESID_KEYS = ("fzT", "fyT", "fxT", "table", "pos_orig")

# HBM budget for saving the fw sort plans as custom-VJP residuals.  The
# plan (one full ``lax.sort`` + table build per chunk x sub-grid) is the
# dominant cost of both passes at the reference splatter bench config
# (~45% of fwbw, measured v5e); saving it lets the backward skip the
# recompute entirely.  Beyond the budget (very large ray sets) the
# backward falls back to recomputing, trading time for memory.
_PLAN_RESID_BUDGET = 3 * 1024 ** 3


def _plan_resid_bytes(cfg, geos, n_chunks, chunk_r):
    from .kernels import splatter_sorted as ss

    N = chunk_r * cfg.tot_num_samples
    tot = 0
    for geo in geos:
        _nb, ngc = ss._caps(geo, N)
        npad = ngc * ss.GBINS * ss.BIN
        ngc8 = -(-ngc // 8) * 8
        tot += (3 * npad + ngc8 * 128 + N) * 4
    return tot * n_chunks


def _save_sorted_plans(cfg, geom) -> bool:
    from .kernels import splatter_sorted as ss

    geos = ss.sorted_geos(cfg)
    n_chunks, chunk_r = _sorted_chunk_shape(
        geom[0].shape[0], cfg.tot_num_samples,
        mlp=len(cfg.n_hidden) > 0, n_grids=len(geos),
    )
    return _plan_resid_bytes(cfg, geos, n_chunks, chunk_r) \
        <= _PLAN_RESID_BUDGET


def _sorted_fwd_impl(cfg: _SplatCfg, geom, diff, want_plans: bool = False):
    """Chunk-scanned sorted splat: pad rays to equal chunks (padding rows
    have valid_mask=0 so the plan kills them via the _BIG coord sentinel),
    then scan the chunks over one padded HBM accumulator per sub-grid
    (multi-grid lists run one sort + one kernel pass per sub-grid,
    sharing the chunk's sample stream).

    ``want_plans=True`` (the custom-VJP forward under the residual
    budget) additionally returns the per-(chunk, sub-grid) plan tables
    the backward needs — stacked as scan ys — so the backward skips its
    plan recompute (including the un-sort map's second sort, computed
    here via ``want_pos``)."""
    from .kernels import splatter_sorted as ss

    geos = ss.sorted_geos(cfg)
    R = geom[0].shape[0]
    splatting_feature, input_grid_flat, mlp_params = diff
    with_mlp = len(cfg.n_hidden) > 0
    n_chunks, chunk_r = _sorted_chunk_shape(
        R, cfg.tot_num_samples, mlp=with_mlp, n_grids=len(geos)
    )
    Rp = n_chunks * chunk_r
    stack = lambda a: _pad_rows(a, Rp).reshape(
        (n_chunks, chunk_r) + a.shape[1:]
    )
    xs = tuple(stack(a) for a in geom) + (stack(splatting_feature),)
    accs0 = tuple(
        zeros_with_vma((g.PZ, g.PY, g.LX), jnp.float32, geom[0])
        for g in geos
    )

    def body(accs, xs_c):
        geom_c, feat_c = xs_c[:-1], xs_c[-1]
        fused = (
            _fused_sample_chunk(
                cfg, geom_c, feat_c, input_grid_flat, mlp_params
            )
            if with_mlp else None
        )
        feat_aug = (
            None if with_mlp else ss.feat_augmented(feat_c, geom_c[5])
        )
        out = []
        plans_out = []
        for geo, acc in zip(geos, accs):
            # no-MLP: the plan's merged slot gather returns the splat
            # values fused with the geometry rows (one gather, not two)
            plan = ss.sorted_plan(cfg, geo, geom_c, want_pos=want_plans,
                                  feat_aug=feat_aug)
            if with_mlp:
                vals = ss.sorted_vals_sample(geo, plan, fused, geom_c[5])
            else:
                vals = plan.pop("vals")
            out.append(ss.sorted_splat_acc(cfg, geo, plan, vals, acc))
            if want_plans:
                plans_out.append({k: plan[k] for k in _PLAN_RESID_KEYS})
        return tuple(out), (plans_out if want_plans else None)

    if n_chunks == 1:
        accs, plans = body(accs0, tuple(a[0] for a in xs))
    else:
        accs, plans = jax.lax.scan(body, accs0, xs)
    feats, ws = zip(*[
        ss.crop_acc_fast(geo, acc) for geo, acc in zip(geos, accs)
    ])
    cat = lambda parts: (
        parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    )
    out = (cat(feats), cat(ws))
    return (out, plans) if want_plans else out


def _sorted_grad_grids(cfg, geos, g_feat_grid):
    """Per-sub-grid padded kernel-frame gradient views of the flat
    incoming gradient (computed once per backward, shared by chunks)."""
    from .kernels import splatter_sorted as ss

    ggs = []
    off = 0
    for geo in geos:
        n = geo.B * geo.gD * geo.gH * geo.gW
        ggs.append(ss.pad_grad_grid_fast(geo, g_feat_grid[off: off + n]))
        off += n
    return ggs


def _sorted_bwd_impl(cfg: _SplatCfg, geom, g_feat_grid, plans=None):
    """Chunk-scanned sorted-splat adjoint.  ``plans`` — the fw pass's
    saved per-(chunk, sub-grid) plan tables — skips the plan recompute
    (the dominant cost of the pass); ``None`` re-derives each chunk's
    plan from the geometry (exact: the sort is deterministic)."""
    from .kernels import splatter_sorted as ss

    geos = ss.sorted_geos(cfg)
    R = geom[0].shape[0]
    n_chunks, chunk_r = _sorted_chunk_shape(
        R, cfg.tot_num_samples, n_grids=len(geos)
    )
    Rp = n_chunks * chunk_r
    stack = lambda a: _pad_rows(a, Rp).reshape(
        (n_chunks, chunk_r) + a.shape[1:]
    )
    geom_s = tuple(stack(a) for a in geom)
    ggs = _sorted_grad_grids(cfg, geos, g_feat_grid)

    def body(_, xs_c):
        geom_c, plans_c = xs_c
        g_enc = None
        for gi, (geo, gg) in enumerate(zip(geos, ggs)):
            plan = (
                plans_c[gi] if plans_c is not None
                else ss.sorted_plan(cfg, geo, geom_c)
            )
            t = ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, gg)
            g_enc = t if g_enc is None else g_enc + t
        return 0, g_enc * geom_c[5][:, None]

    if n_chunks == 1:
        _, g_enc = body(0, (tuple(a[0] for a in geom_s), plans))
    else:
        _, gs = jax.lax.scan(body, 0, (geom_s, plans))
        g_enc = gs.reshape(Rp, gs.shape[-1])
    return g_enc[:R]


def _sorted_bwd_mlp_impl(cfg: _SplatCfg, geom, diff, g_feat_grid,
                         plans=None):
    """MLP-splatter adjoint on the sorted path: the per-sample gradient
    stream from the bw kernel (summed over the grid-list's sub-grids) is
    the cotangent of the fused per-sample vectors — one ``jax.vjp``
    through the batched sample+MLP recompute yields (g_encoding,
    g_input_grid, g_mlp_params) per chunk (reference
    ``templates/splatter_bw.py:183-394``).  The input-grid/MLP grads
    accumulate across chunks in the scan carry."""
    from .kernels import splatter_sorted as ss

    geos = ss.sorted_geos(cfg)
    encoding, input_grid_flat, mlp_params = diff
    R = geom[0].shape[0]
    n_chunks, chunk_r = _sorted_chunk_shape(
        R, cfg.tot_num_samples, mlp=True, n_grids=len(geos)
    )
    Rp = n_chunks * chunk_r
    stack = lambda a: _pad_rows(a, Rp).reshape(
        (n_chunks, chunk_r) + a.shape[1:]
    )
    xs = tuple(stack(a) for a in geom) + (stack(encoding),)
    ggs = _sorted_grad_grids(cfg, geos, g_feat_grid)

    def body(carry, xs_cp):
        xs_c, plans_c = xs_cp
        g_ig, g_mlp = carry
        geom_c, enc_c = xs_c[:-1], xs_c[-1]
        g_s = None
        for gi, (geo, gg) in enumerate(zip(geos, ggs)):
            plan = (
                plans_c[gi] if plans_c is not None
                else ss.sorted_plan(cfg, geo, geom_c)
            )
            t = ss.sorted_splat_bwd(cfg, geo, plan, chunk_r, gg,
                                    per_sample=True)
            g_s = t if g_s is None else g_s + t
        _, chunk_vjp = jax.vjp(
            lambda e, ig, mp: _fused_sample_chunk(cfg, geom_c, e, ig, mp),
            enc_c, input_grid_flat, mlp_params,
        )
        d_enc, d_ig, d_mlp = chunk_vjp(g_s)
        return (g_ig + d_ig, g_mlp + d_mlp), d_enc

    init = (
        zeros_with_vma(
            input_grid_flat.shape, input_grid_flat.dtype, geom[2]
        ),
        zeros_with_vma(mlp_params.shape, mlp_params.dtype, geom[2]),
    )
    if n_chunks == 1:
        (g_ig, g_mlp), g_enc = body(
            init, (tuple(a[0] for a in xs), plans)
        )
    else:
        (g_ig, g_mlp), gs = jax.lax.scan(body, init, (xs, plans))
        g_enc = gs.reshape(Rp, gs.shape[-1])
    return g_enc[:R], g_ig, g_mlp


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_core_sorted(cfg: _SplatCfg, geom, diff):
    return _sorted_fwd_impl(cfg, geom, diff)


def _splat_sorted_fwd(cfg, geom, diff):
    if _save_sorted_plans(cfg, geom):
        out, plans = _sorted_fwd_impl(cfg, geom, diff, want_plans=True)
        return out, (geom, diff, plans)
    return _sorted_fwd_impl(cfg, geom, diff), (geom, diff, None)


def _splat_sorted_bwd(cfg: _SplatCfg, res, g_out):
    geom, diff, plans = res
    g_feat_grid, _g_w_grid = g_out  # weight cotangent ignored (see above)
    if len(cfg.n_hidden) == 0:
        grads = (
            _sorted_bwd_impl(cfg, geom, g_feat_grid, plans=plans),
            None, None,
        )
    else:
        grads = _sorted_bwd_mlp_impl(cfg, geom, diff, g_feat_grid,
                                     plans=plans)
    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(grads, "splatter(sorted)")


_splat_core_sorted.defvjp(_splat_sorted_fwd, _splat_sorted_bwd)


def _use_sorted_splat(cfg, impl: str) -> bool:
    from .kernels import splatter_sorted as ss

    if impl == "sorted":
        return True
    if impl != "auto":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from .kernels import splatter_pallas as sp

    # For grids beyond VMEM the sorted kernel is the auto choice for ANY
    # ray order: its HBM traffic is one accumulator pass + the sample
    # streams, vs the boxed-DMA kernel re-streaming a z/y-window x full-x
    # box per (ray-block, chunk) (~150x more bytes at the reference
    # 160^3x64 bench config).  The boxed kernel remains via impl="big".
    return (
        not sp.pallas_splatter_supported(cfg)
        and ss.sorted_splat_supported(cfg)
    )


# ---------------------------------------------------------------------------
# Pallas-kernel core (see kernels/splatter_pallas.py)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _splat_core_pallas(cfg: _SplatCfg, geom, diff):
    from .kernels import splatter_pallas as sp

    return sp.pallas_splat_fwd(cfg, geom, diff)


def _splat_fwd_pallas(cfg, geom, diff):
    from .kernels import splatter_pallas as sp

    return sp.pallas_splat_fwd(cfg, geom, diff), (geom, diff)


def _splat_bwd_pallas(cfg, res, g_out):
    from .kernels import splatter_pallas as sp

    geom, diff = res
    g_feat_grid, _g_w_grid = g_out  # weight cotangent ignored (see above)
    g_enc, g_igrid, g_mlp = sp.pallas_splat_bwd(cfg, geom, diff, g_feat_grid)
    g_geom = jax.tree_util.tree_map(zero_cotangent, geom)
    return g_geom, assert_grads_finite(
        (g_enc, g_igrid, g_mlp), "splatter(pallas)"
    )


_splat_core_pallas.defvjp(_splat_fwd_pallas, _splat_bwd_pallas)


def _use_pallas_splat(cfg, impl: str) -> bool:
    from .kernels import splatter_pallas as sp

    if impl == "pallas":
        return True
    if impl != "auto":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return sp.pallas_splatter_supported(cfg)


def _use_big_splat(cfg, impl: str) -> bool:
    from .kernels import splatter_big as sb

    if impl == "big":
        return True
    if impl != "auto":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from .kernels import splatter_pallas as sp
    from .kernels import splatter_sorted as ss

    # auto-picked only where the sorted kernel cannot go (e.g. multi-grid
    # boxable lists); see _use_sorted_splat for why sorted wins otherwise
    return (
        not sp.pallas_splatter_supported(cfg)
        and not ss.sorted_splat_supported(cfg)
        and sb.big_splat_supported(cfg)
    )


# ---------------------------------------------------------------------------
# Public functional API
# ---------------------------------------------------------------------------


def _normalize_output_grid_size(output_grid_size):
    return tuple(tuple(int(s) for s in gs) for gs in output_grid_size)


def lightplane_splatter_raw(
    rays: Rays,
    output_grid_size,
    mlp_params: Optional[SplatterParams] = None,
    input_grid=None,
    *,
    num_samples: int,
    num_samples_inf: int = 0,
    mask_out_of_bounds_samples: bool = False,
    contract_coords: bool = False,
    disparity_at_inf: float = 1e-5,
    input_grid_sizes=None,
    impl: str = "auto",
):
    """Un-normalized splat: returns flat ``(feature_grid [V, C],
    weight_grid [V, 1])`` accumulators (linear in the ray set — psum-able
    across device shards before normalization)."""
    return _run_splatter(
        rays, output_grid_size, mlp_params, input_grid,
        num_samples, num_samples_inf, mask_out_of_bounds_samples,
        contract_coords, disparity_at_inf, input_grid_sizes,
        return_list=False, raw=True, impl=impl,
    )


def _run_splatter(
    rays: Rays,
    output_grid_size,
    mlp_params: Optional[SplatterParams],
    input_grid,
    num_samples: int,
    num_samples_inf: int,
    mask_out_of_bounds_samples: bool,
    contract_coords: bool,
    disparity_at_inf: float,
    input_grid_sizes,
    return_list: bool,
    raw: bool = False,
    impl: str = "auto",
):
    if rays.encoding is None:
        raise ValueError("The splatter requires rays.encoding to be set.")
    output_grid_size = _normalize_output_grid_size(output_grid_size)

    # Up-front channel validation (reference lightplane_splatter.py:31-164
    # validates inputs before launching): a mismatch otherwise surfaces as
    # an opaque broadcast error from deep inside a kernel path.
    out_chns = {int(gs[-1]) for gs in output_grid_size}
    if len(out_chns) != 1:
        raise ValueError(
            "every output grid must have the same channel count; got "
            f"{sorted(out_chns)}"
        )
    batches = {int(gs[0]) for gs in output_grid_size}
    if len(batches) != 1:
        raise ValueError(
            "every output grid must share one batch size (rays.grid_idx "
            f"indexes the batch of EVERY sub-grid); got {sorted(batches)}"
        )
    out_chn = next(iter(out_chns))
    enc_chn = int(rays.encoding.shape[-1])
    if mlp_params is None:
        if enc_chn != out_chn:
            raise ValueError(
                f"rays.encoding has {enc_chn} channels but the output "
                f"grid-list has {out_chn}; without an MLP the encoding is "
                "splatted directly and the channel counts must match."
            )
    else:
        n_hidden = tuple(int(n) for n in mlp_params.n_hidden)
        if int(n_hidden[-1]) != out_chn:
            raise ValueError(
                f"the splatter MLP outputs {n_hidden[-1]} channels but the "
                f"output grid-list has {out_chn}."
            )
        if enc_chn != int(n_hidden[0]):
            raise ValueError(
                f"rays.encoding has {enc_chn} channels but the splatter "
                f"MLP expects {n_hidden[0]} inputs (the encoding is added "
                "to the sampled input-grid feature before the MLP)."
            )

    if input_grid is not None:
        check_grid_and_color_grid(input_grid, None, input_grid_sizes, None)
        input_grid_flat, _, input_grid_sizes, _ = process_and_flatten_grid(
            input_grid, None, input_grid_sizes, None
        )
    else:
        input_grid_flat, input_grid_sizes = None, None

    if mlp_params is not None and input_grid_sizes is not None:
        in_chns = {int(gs[-1]) for gs in input_grid_sizes}
        want = int(tuple(mlp_params.n_hidden)[0])
        if in_chns != {want}:
            raise ValueError(
                f"input_grid channel counts {sorted(in_chns)} do not match "
                f"the splatter MLP input width {want}."
            )

    cfg = _SplatCfg(
        num_samples=int(num_samples),
        num_samples_inf=int(num_samples_inf),
        mask_out_of_bounds_samples=bool(mask_out_of_bounds_samples),
        contract_coords=bool(contract_coords),
        disparity_at_inf=float(disparity_at_inf),
        output_grid_sizes=output_grid_size,
        input_grid_sizes=input_grid_sizes,
        n_hidden=mlp_params.n_hidden if mlp_params is not None else (),
        total_rays=int(rays.directions.shape[0]),
    )

    valid_mask = jnp.ones((rays.directions.shape[0],), rays.encoding.dtype)
    geom = (
        rays.directions, rays.origins, rays.near, rays.far,
        rays.grid_idx.astype(jnp.int32), valid_mask,
    )
    diff = (
        rays.encoding,
        input_grid_flat,
        mlp_params.mlp_params if mlp_params is not None else None,
    )
    if impl == "big" and len(cfg.n_hidden) > 0:
        raise ValueError(
            "impl='big' does not support the fused-MLP splatter (its "
            "backward produces no input-grid/MLP grads); use impl='sorted' "
            "(any big grid) or 'auto'."
        )
    if _use_sorted_splat(cfg, impl):
        core = _splat_core_sorted
    elif _use_big_splat(cfg, impl):
        core = _splat_core_big
    elif _use_pallas_splat(cfg, impl):
        core = _splat_core_pallas
    else:
        core = _splat_core
    feat_grid, w_grid = core(cfg, geom, diff)
    if raw:
        return feat_grid, w_grid
    grid_flat = feat_grid / jnp.clip(w_grid, min=WEIGHT_GRID_EPS)
    if return_list:
        return list(unflatten_grid(grid_flat, output_grid_size))
    return grid_flat


def lightplane_splatter(
    rays: Rays,
    output_grid_size,
    # ------ config keys ------
    num_samples: int,
    num_samples_inf: int = 0,
    mask_out_of_bounds_samples: bool = False,
    contract_coords: bool = False,
    disparity_at_inf: float = 1e-5,
    return_list: bool = True,
    impl: str = "auto",
):
    """Fused splatter: pushes ``rays.encoding`` along each ray into a
    zero-initialized grid-list of ``output_grid_size``, normalized by the
    splat-weight grid.  Mirrors reference ``lightplane_splatter.py:31-164``.

    Returns the splatted grid-list (or the flat ``[V_total, C]`` tensor if
    ``return_list=False``).
    """
    return _run_splatter(
        rays, output_grid_size, None, None,
        num_samples, num_samples_inf, mask_out_of_bounds_samples,
        contract_coords, disparity_at_inf, None, return_list, impl=impl,
    )


def lightplane_mlp_splatter(
    rays: Rays,
    output_grid_size,
    mlp_params: SplatterParams,
    input_grid: Union[Sequence[jnp.ndarray], jnp.ndarray],
    # ------ config keys ------
    num_samples: int,
    num_samples_inf: int = 0,
    mask_out_of_bounds_samples: bool = False,
    contract_coords: bool = False,
    disparity_at_inf: float = 1e-5,
    input_grid_sizes=None,
    return_list: bool = True,
    impl: str = "auto",
):
    """Fused splatter with a prior ``input_grid``: each sample gathers the
    prior feature, adds the ray's ``encoding``, maps through the splatter MLP
    and splats the result.  Mirrors reference
    ``lightplane_splatter.py:167-338``.
    """
    assert input_grid is not None, "input_grid must be provided"
    return _run_splatter(
        rays, output_grid_size, mlp_params, input_grid,
        num_samples, num_samples_inf, mask_out_of_bounds_samples,
        contract_coords, disparity_at_inf, input_grid_sizes, return_list,
        impl=impl,
    )
