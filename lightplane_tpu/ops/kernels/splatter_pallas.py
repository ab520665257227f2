"""Fused Pallas TPU splatter kernels (forward + backward).

TPU-native replacement for the reference's Triton splatter kernels
(``templates/splatter_fw.py:71-309``, ``templates/splatter_bw.py:75-394``).
Same stencil-matmul machinery as the renderer kernels
(``renderer_pallas.py``): the splat of a step is ``grid += Sᵀ @ values`` on
the MXU — deterministic, atomics-free — and the backward's gather is
``S @ grad_grid``.  Features and the unit collision weights are splatted
together as ``C+1`` channels in one matmul (the reference launches a second
C=1 kernel pass, ``lightplane_splatter.py:507-539``).

Outputs are the *raw* (feature, weight) accumulators; normalization and its
no-gradient-through-the-denominator semantics live in ``ops/splatter.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mlp_utils import _flattened_one_mlp_params_to_list
from .renderer_pallas import (
    MAX_CELLS_PER_GRID,
    RAY_BLOCK,
    _contract_pi,
    _make_iotas,
    _mlp_bwd,
    _mlp_fwd,
    _pad_rays_to_block,
    _sample,
    _splat_accum,
    _stencil,
    _step_depth_delta,
    grid_infos,
)
from . import renderer_pallas as _rp


def pallas_splatter_supported(cfg) -> bool:
    all_sizes = list(cfg.output_grid_sizes) + list(cfg.input_grid_sizes or ())
    for (b, d, h, w, c) in all_sizes:
        if b * d * h * w > MAX_CELLS_PER_GRID:
            return False
    return True


def _splat_mlps(cfg, mlp_params):
    if len(cfg.n_hidden) == 0:
        return [], []
    w, b = _flattened_one_mlp_params_to_list(mlp_params, cfg.n_hidden)
    return list(w), [bi.reshape(1, -1) for bi in b]


def _build_fw_kernel(cfg, out_infos, in_infos, n_layers):
    has_mlp = n_layers > 0
    C = cfg.out_chn

    def kernel(*refs):
        o_ref, d_ref, near_ref, far_ref, gsel_ref, enc_ref, vm_ref = refs[:7]
        rest = refs[7:]
        if has_mlp:
            igrid_ref = rest[0]
            rest = rest[1:]
            w_refs = rest[: 2 * n_layers]
            rest = rest[2 * n_layers:]
        else:
            igrid_ref = None
            w_refs = ()
        acc_ref = rest[0]

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        origins = o_ref[:]
        dirs = d_ref[:]
        near = near_ref[:]
        far = far_ref[:]
        gsel = gsel_ref[:]
        enc = enc_ref[:]
        valid = vm_ref[:]

        weights = [r[:] for r in w_refs[:n_layers]]
        biases = [r[:] for r in w_refs[n_layers:]]

        out_iotas = [_make_iotas(i) for i in out_infos]
        in_iotas = [_make_iotas(i) for i in in_infos] if has_mlp else None
        S = cfg.tot_num_samples

        def body(s, _):
            t, _delta = _step_depth_delta(cfg, near, far, s)
            pts = origins + t * dirs
            if cfg.contract_coords:
                pts = _contract_pi(pts)
            if has_mlp:
                sampled = _sample(
                    igrid_ref, in_infos, in_iotas, pts, gsel,
                    cfg.mask_out_of_bounds_samples,
                )
                vec, _ = _mlp_fwd(sampled + enc, weights, biases)
            else:
                vec = enc
            vec = vec * valid
            aug = jnp.concatenate([vec, valid], axis=1)  # [B, C+1]
            _splat_accum(acc_ref, out_infos, out_iotas, pts, gsel,
                         cfg.mask_out_of_bounds_samples, aug)
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    return kernel


def _ray_inputs_splat(cfg, geom):
    directions, origins, near, far, grid_idx, valid_mask = geom
    R = directions.shape[0]
    return [
        origins, directions, near[:, None], far[:, None],
        grid_idx[:, None].astype(jnp.int32),
    ], valid_mask[:, None], R


def pallas_splat_fwd(cfg, geom, diff):
    """Raw (feature_grid [V, C], weight_grid [V, 1]) via the fused kernel."""
    splatting_feature, input_grid_flat, mlp_params = diff
    out_infos = grid_infos(cfg.output_grid_sizes)
    in_infos = (
        grid_infos(cfg.input_grid_sizes)
        if cfg.input_grid_sizes is not None else ()
    )
    weights, biases = _splat_mlps(cfg, mlp_params)
    n_layers = len(weights)
    C = cfg.out_chn
    V = cfg.v_total

    base, valid, R = _ray_inputs_splat(cfg, geom)
    # kernel arg order: o, d, near, far, gsel, enc, valid
    arrs = base + [splatting_feature]
    arrs, R_pad = _pad_rays_to_block(arrs, R, RAY_BLOCK)
    # valid mask MUST zero-pad: geometry edge-pads for block coherence,
    # and the mask is what keeps the replicated rays from splatting
    valid_p, _ = _pad_rays_to_block([valid], R, RAY_BLOCK,
                                    mode="constant")
    arrs = arrs + valid_p
    n_blocks = R_pad // RAY_BLOCK

    kernel = _build_fw_kernel(cfg, out_infos, in_infos, n_layers)

    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = list(ray_specs)
    inputs = list(arrs)
    if n_layers > 0:
        in_specs.append(full(input_grid_flat.shape))
        inputs.append(input_grid_flat)
        for t in (*weights, *biases):
            in_specs.append(full(t.shape))
            inputs.append(t)

    acc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=full((V, C + 1)),
        out_shape=jax.ShapeDtypeStruct((V, C + 1), jnp.float32),
        interpret=_rp.INTERPRET,
        compiler_params=_rp._COMPILER_PARAMS,
    )(*inputs)
    return acc[:, :C], acc[:, C:]


def _build_bw_kernel(cfg, out_infos, in_infos, n_layers):
    has_mlp = n_layers > 0

    def kernel(*refs):
        (o_ref, d_ref, near_ref, far_ref, gsel_ref, enc_ref,
         vm_ref, gfeat_ref) = refs[:8]
        rest = refs[8:]
        if has_mlp:
            igrid_ref = rest[0]
            rest = rest[1:]
            w_refs = rest[: 2 * n_layers]
            rest = rest[2 * n_layers:]
        else:
            igrid_ref = None
            w_refs = ()
        genc_ref = rest[0]
        rest = rest[1:]
        if has_mlp:
            gigrid_ref = rest[0]
            gmlp_refs = rest[1:]
        else:
            gigrid_ref = None
            gmlp_refs = ()

        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            if gigrid_ref is not None:
                gigrid_ref[...] = jnp.zeros_like(gigrid_ref)
            for r in gmlp_refs:
                r[...] = jnp.zeros_like(r)

        origins = o_ref[:]
        dirs = d_ref[:]
        near = near_ref[:]
        far = far_ref[:]
        gsel = gsel_ref[:]
        enc = enc_ref[:]
        valid = vm_ref[:]

        weights = [r[:] for r in w_refs[:n_layers]]
        biases = [r[:] for r in w_refs[n_layers:]]

        out_iotas = [_make_iotas(i) for i in out_infos]
        in_iotas = [_make_iotas(i) for i in in_infos] if has_mlp else None
        S = cfg.tot_num_samples
        B = origins.shape[0]

        def zero_mlp_grads():
            return tuple(
                jnp.zeros_like(t) for t in (*weights, *biases)
            )

        def body(s, carry):
            genc_acc, gmlp_acc = carry
            t, _delta = _step_depth_delta(cfg, near, far, s)
            pts = origins + t * dirs
            if cfg.contract_coords:
                pts = _contract_pi(pts)
            # adjoint of the splat: gather the incoming gradient
            g_vec = _sample(gfeat_ref, out_infos, out_iotas, pts, gsel,
                            cfg.mask_out_of_bounds_samples) * valid
            if not has_mlp:
                return (genc_acc + g_vec, gmlp_acc)
            sampled = _sample(
                igrid_ref, in_infos, in_iotas, pts, gsel,
                cfg.mask_out_of_bounds_samples,
            )
            _, saved = _mlp_fwd(sampled + enc, weights, biases)
            g_in, grads = _mlp_bwd(g_vec, saved, weights)
            _splat_accum(gigrid_ref, in_infos, in_iotas, pts, gsel,
                         cfg.mask_out_of_bounds_samples, g_in)
            flat = (
                [g[0] for g in grads] + [g[1] for g in grads]
            )
            gmlp_new = tuple(a + g for a, g in zip(gmlp_acc, flat))
            return (genc_acc + g_in, gmlp_new)

        init = (jnp.zeros_like(enc), zero_mlp_grads())
        genc, gmlp = jax.lax.fori_loop(0, S, body, init)
        genc_ref[:] = genc
        for r, g in zip(gmlp_refs, gmlp):
            r[...] += g.reshape(r.shape)

    return kernel


def pallas_splat_bwd(cfg, geom, diff, g_feat_grid):
    """Gradients (g_splatting_feature, g_input_grid, g_mlp_params) from the
    raw feature-grid cotangent."""
    splatting_feature, input_grid_flat, mlp_params = diff
    out_infos = grid_infos(cfg.output_grid_sizes)
    in_infos = (
        grid_infos(cfg.input_grid_sizes)
        if cfg.input_grid_sizes is not None else ()
    )
    weights, biases = _splat_mlps(cfg, mlp_params)
    n_layers = len(weights)

    base, valid, R = _ray_inputs_splat(cfg, geom)
    arrs = base + [splatting_feature]
    arrs, R_pad = _pad_rays_to_block(arrs, R, RAY_BLOCK)
    # valid mask MUST zero-pad: geometry edge-pads for block coherence,
    # and the mask is what keeps the replicated rays from splatting
    valid_p, _ = _pad_rays_to_block([valid], R, RAY_BLOCK,
                                    mode="constant")
    arrs = arrs + valid_p
    n_blocks = R_pad // RAY_BLOCK

    kernel = _build_bw_kernel(cfg, out_infos, in_infos, n_layers)

    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = list(ray_specs) + [full(g_feat_grid.shape)]
    inputs = list(arrs) + [g_feat_grid]
    mlp_tensors = [*weights, *biases]
    if n_layers > 0:
        in_specs.append(full(input_grid_flat.shape))
        inputs.append(input_grid_flat)
        for t in mlp_tensors:
            in_specs.append(full(t.shape))
            inputs.append(t)

    C_enc = splatting_feature.shape[1]
    out_shape = [jax.ShapeDtypeStruct((R_pad, C_enc), jnp.float32)]
    out_specs = [
        pl.BlockSpec((RAY_BLOCK, C_enc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
    ]
    if n_layers > 0:
        out_shape.append(
            jax.ShapeDtypeStruct(input_grid_flat.shape, jnp.float32)
        )
        out_specs.append(full(input_grid_flat.shape))
        for t in mlp_tensors:
            out_shape.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
            out_specs.append(full(t.shape))

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_rp.INTERPRET,
        compiler_params=_rp._COMPILER_PARAMS,
    )(*inputs)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]
    g_enc = outs.pop(0)[:R]
    if n_layers == 0:
        return g_enc, None, None
    g_igrid = outs.pop(0)
    gw = outs[:n_layers]
    gb = outs[n_layers:]
    g_mlp = jnp.concatenate(
        [g.reshape(-1) for g in gw] + [g.reshape(-1) for g in gb]
    )
    return g_enc, g_igrid, g_mlp
