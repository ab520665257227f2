"""Fused Pallas TPU renderer kernels (forward + backward).

The TPU-native replacement for the reference's Triton fw/bw kernels
(``templates/renderer_fw.py:85-375``, ``templates/renderer_bw.py:89-627``).
One Pallas program processes a block of ``B`` rays; the whole march loop runs
inside the kernel with the grid-list, the MLP weights, and all ray state
resident in VMEM — the hot loop touches HBM zero times.

**Gather/scatter without atomics or gather hardware.**  TPUs have no
scalable dynamic gather inside kernels (Mosaic only lowers single-tile
shuffles) and no scatter at all, so the bilinear grid sample is re-expressed
as a *stencil matmul* on the MXU:

    stencil[b, v] = Ab(b,v) * Az(b,v) * Ay(b,v) * Ax(b,v)      # [B, V_g]
    sampled       = stencil @ grid_g                            # MXU
    grad_grid_g  += stencil.T @ d_sampled                       # MXU (bw)

where each factor is a fused compare-and-weight over the flat cell iota
(e.g. ``Ax = (xv==x0)*wx0 + (xv==x1)*wx1``).  Out-of-bounds corners match no
cell and contribute zero — exactly the zeros-padding semantics of the
reference sampler (``grid_sample_util.py:638-714``).  The transpose form
replaces the reference's ``tl.atomic_add`` grid-gradient splats
(``renderer_bw.py:477-534``) and is fully deterministic.

The backward kernel marches far -> near, recomputes the forward per step,
rewinds the transmittance analytically and accumulates the EA suffix-sum
adjoint — the same O(1)-in-samples scheme as the scan path (see
``ops/renderer.py``) and the reference bw kernel.  Gradient outputs (grid,
MLP params) map every program to the same output block; TPU Pallas grids
execute sequentially per core, so revisiting accumulation is race-free.

Applicability: every sub-grid's cell count ``B_batch*D*H*W`` must fit the
stencil budget (``MAX_CELLS_PER_GRID``); scaffolds fall back to the scan
path.  This covers triplanes/multi-plane models and small voxel grids — the
reference's headline benchmark shapes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..const import MIN_BLOCK_SIZE
from ..mlp_utils import _flattened_one_mlp_params_to_list, _mlp_numel

# Per-sub-grid stencil width limit: [RAY_BLOCK, V_g] f32 must sit in VMEM
# alongside the grids and MLP state.
MAX_CELLS_PER_GRID = 8192
RAY_BLOCK = 512

# Run kernels in the Pallas interpreter (for CPU testing of kernel logic).
INTERPRET = False

INT32_PRIME = 105097564
_MAX_INT_32_F = 2147483647.0
_MAX_UINT_32_F = 4294967295.0
_MAX_UINT_32_F_EPS = 3.0
_TWO_PI = 6.28318530718


@dataclasses.dataclass(frozen=True)
class _GridInfo:
    offset: int   # row offset of this sub-grid in the flat [V_total, C]
    batch: int
    D: int
    H: int
    W: int

    @property
    def cells(self) -> int:
        return self.batch * self.D * self.H * self.W


def grid_infos(grid_sizes) -> Tuple[_GridInfo, ...]:
    infos = []
    off = 0
    for (b, d, h, w, c) in grid_sizes:
        infos.append(_GridInfo(off, b, d, h, w))
        off += b * d * h * w
    return tuple(infos)


def pallas_renderer_supported(cfg) -> bool:
    """Whether the fused Pallas kernels can run this config."""
    if cfg.use_scaffold:
        return False
    all_sizes = list(cfg.grid_sizes) + list(cfg.color_grid_sizes or ())
    for (b, d, h, w, c) in all_sizes:
        if b * d * h * w > MAX_CELLS_PER_GRID:
            return False
    return True


# ---------------------------------------------------------------------------
# In-kernel helpers (plain jax on VMEM values)
# ---------------------------------------------------------------------------


def _hash_i32(x):
    x = ((x >> 16) ^ x) * np.int32(0x45D9F3B)
    x = ((x >> 16) ^ x) * np.int32(0x45D9F3B)
    return (x >> 16) ^ x


def _pair_hash_i32(x, h):
    h = h ^ x
    return (h << 24) + h * np.int32(0x193)


def _int_to_randn(i1, i2, seed):
    h1 = _pair_hash_i32(_pair_hash_i32(jnp.int32(INT32_PRIME), seed),
                        _hash_i32(i1))
    h2 = _pair_hash_i32(_pair_hash_i32(jnp.int32(INT32_PRIME), seed + 1),
                        _hash_i32(i2))
    u1 = (h1.astype(jnp.float32) + _MAX_INT_32_F + _MAX_UINT_32_F_EPS) / (
        _MAX_UINT_32_F + _MAX_UINT_32_F_EPS
    )
    u2 = (h2.astype(jnp.float32) + _MAX_INT_32_F + _MAX_UINT_32_F_EPS) / (
        _MAX_UINT_32_F + _MAX_UINT_32_F_EPS
    )
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _contract_pi(x):
    n = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_abs = jnp.abs(x)
    safe_abs = jnp.where(x_abs > 0, x_abs, 1.0)
    safe_n = jnp.where(n > 0, n, 1.0)
    out = jnp.where(
        n <= 1.0,
        x,
        jnp.where(
            jnp.abs(x_abs - n) <= 1e-7,
            (2.0 - 1.0 / safe_abs) * (x / safe_abs),
            x / safe_n,
        ),
    )
    return out / 2.0


def _step_depth_delta(cfg, near, far, s):
    """Same schedule as ops.renderer._step_depth_delta, on [B, 1] arrays."""
    ns, ni = cfg.num_samples, cfg.num_samples_inf
    s_f = s.astype(jnp.float32)

    def lin_depth(si):
        if ns > 1:
            return near + (far - near) * (si / (ns - 1))
        return near

    def inf_depth(si):
        frac = (si - ns + 1.0) / ni
        n_disp = cfg.disparity_at_inf * frac + (1.0 - frac)
        return far * (1.0 / n_disp)

    if ni > 0:
        t = jnp.where(s_f < ns, lin_depth(s_f), inf_depth(s_f))
        t_prev = jnp.where(s_f - 1 < ns, lin_depth(s_f - 1.0),
                           inf_depth(s_f - 1.0))
    else:
        t = lin_depth(s_f)
        t_prev = lin_depth(s_f - 1.0)
    delta0 = (far - near) / (ns - 1) if ns > 1 else jnp.ones_like(near)
    delta = jnp.where(s_f < 1, delta0, t - t_prev)
    return t, delta


def _axis_factor(iota_axis, f, size, weight_lo, weight_hi):
    """One separable stencil factor over a flat-cell iota component:
    ``(iota==floor(f))*w_lo + (iota==floor(f)+1)*w_hi``.

    ``iota_axis``: [1, V_g] int32; ``f``: [B, 1] float coordinate in cell
    units.  OOB corner indices match no cell -> zero contribution.
    """
    lo = jnp.floor(f).astype(jnp.int32)
    return (
        jnp.where(iota_axis == lo, weight_lo, 0.0)
        + jnp.where(iota_axis == lo + 1, weight_hi, 0.0)
    )


def _stencil(info: _GridInfo, iotas, pts, gsel):
    """The [B, V_g] bilinear/trilinear sampling stencil of one sub-grid.

    ``iotas`` = (bv, zv, yv, xv) each [1, V_g]; ``pts`` [B, 3] in [-1, 1];
    ``gsel`` [B, 1] int32.  Coordinate mapping is the align_corners=False
    convention with singleton-dim collapse (reference
    ``grid_sample_util.py:209-247``).
    """
    bv, zv, yv, xv = iotas
    x, y, z = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]

    def coords(p, S):
        if S <= 1:
            return jnp.zeros_like(p)
        return ((p + 1.0) * 0.5) * S - 0.5

    fx = coords(x, info.W)
    fy = coords(y, info.H)
    fz = coords(z, info.D)
    tx = fx - jnp.floor(fx)
    ty = fy - jnp.floor(fy)
    tz = fz - jnp.floor(fz)

    st = _axis_factor(xv, fx, info.W, 1.0 - tx, tx)
    st = st * _axis_factor(yv, fy, info.H, 1.0 - ty, ty)
    if info.D > 1:
        st = st * _axis_factor(zv, fz, info.D, 1.0 - tz, tz)
    # (for D == 1 the z coordinate collapses to cell 0 == all cells)
    if info.batch > 1:
        st = st * jnp.where(bv == gsel, 1.0, 0.0)
    return st


def _make_iotas(info: _GridInfo):
    v = jax.lax.broadcasted_iota(jnp.int32, (1, info.cells), 1)
    xv = v % info.W
    yv = (v // info.W) % info.H
    zv = (v // (info.W * info.H)) % info.D
    bv = v // (info.W * info.H * info.D)
    return bv, zv, yv, xv


def _sample(grid_ref, infos, iotas_list, pts, gsel, mask_oob):
    """Stencil-matmul sample of the summed grid-list: [B, C]."""
    out = None
    for info, iotas in zip(infos, iotas_list):
        st = _stencil(info, iotas, pts, gsel)
        g = grid_ref[info.offset: info.offset + info.cells, :]
        smp = jnp.dot(st, g, preferred_element_type=jnp.float32)
        out = smp if out is None else out + smp
    if mask_oob:
        inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1, keepdims=True)
        out = out * inb.astype(out.dtype)
    return out


def _splat_accum(grad_ref, infos, iotas_list, pts, gsel, mask_oob, dval):
    """grad_grid += stencil.T @ dval for each sub-grid (the deterministic
    replacement for atomic splats)."""
    if mask_oob:
        inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1, keepdims=True)
        dval = dval * inb.astype(dval.dtype)
    for info, iotas in zip(infos, iotas_list):
        st = _stencil(info, iotas, pts, gsel)
        # contract over the ray axis: [V_g, C] = st^T @ dval
        upd = jax.lax.dot_general(
            st, dval, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slice(info.offset, info.offset + info.cells)
        grad_ref[sl, :] += upd


def _mlp_fwd(x, weights, biases, final_relu=False):
    """Right-multiplying MLP; relu between layers.  Returns the output and
    the per-layer (input, preact) pairs for the hand-written backward."""
    saved = []
    for l, (w, b) in enumerate(zip(weights, biases)):
        pre = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        saved.append((x, pre))
        x = pre
        if l < len(weights) - 1 or final_relu:
            x = jnp.maximum(x, 0.0)
    return x, saved


def _mlp_bwd(g, saved, weights, final_relu=False):
    """Backward of :func:`_mlp_fwd`; returns (g_input, [(dW, db), ...])."""
    grads = [None] * len(weights)
    n = len(weights)
    for l in range(n - 1, -1, -1):
        x_in, pre = saved[l]
        if l < n - 1 or final_relu:
            g = g * (pre > 0.0).astype(g.dtype)
        # dW = x_in^T @ g ; g_in = g @ W^T — via dot_general, no transposes
        dw = jax.lax.dot_general(
            x_in, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(g, axis=0, keepdims=True)
        grads[l] = (dw, db)
        g = jax.lax.dot_general(
            g, weights[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return g, grads


def _d_softplus(x):
    return jax.nn.sigmoid(x)


def _decoder_fwd(cfg, feat, cfeat, enc, noise, mlps):
    """Shared fw decoder math; returns (sigma, color, residuals)."""
    (w_t, b_t, w_o, b_o, w_c, b_c) = mlps
    if cfg.color_grid_sizes is None:
        if len(w_t) > 0:
            trunk, sv_t = _mlp_fwd(feat, w_t, b_t, final_relu=True)
        else:
            # 0-layer trunk: the post-MLP relu still applies to the raw
            # sampled feature (reference naive_renderer.py:392-399)
            trunk, sv_t = jnp.maximum(feat, 0.0), []
        op_pre, sv_o = _mlp_fwd(trunk, w_o, b_o)
        col_pre, sv_c = _mlp_fwd(trunk + enc, w_c, b_c)
    else:
        feat_r = jnp.maximum(feat, 0.0)
        cfeat_r = jnp.maximum(cfeat, 0.0)
        sv_t = None
        op_pre, sv_o = _mlp_fwd(feat_r, w_o, b_o)
        col_pre, sv_c = _mlp_fwd(cfeat_r + enc, w_c, b_c)
    op_raw = op_pre[:, 0:1]
    if noise is not None:
        op_raw = op_raw + noise
    sigma = cfg.gain * jax.nn.softplus(op_raw)
    color = jax.nn.sigmoid(col_pre)
    return sigma, color, (sv_t, sv_o, sv_c, op_raw, color, feat, cfeat)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _build_fw_kernel(cfg, infos, cinfos, n_mlp):
    n_t, n_o, n_c = n_mlp
    C_col = cfg.n_hidden_color[-1]
    has_cgrid = cfg.color_grid_sizes is not None

    def kernel(*refs):
        (o_ref, d_ref, near_ref, far_ref, gsel_ref, enc_ref,
         seed_ref) = refs[:7]
        rest = refs[7:]
        grid_ref = rest[0]
        rest = rest[1:]
        if has_cgrid:
            cgrid_ref = rest[0]
            rest = rest[1:]
        else:
            cgrid_ref = None
        n_w = 2 * (n_t + n_o + n_c)
        mlp_refs = rest[:n_w]
        depth_ref, nlt_ref, feat_ref = rest[n_w:]

        mlps = _unpack_mlp_refs(mlp_refs, n_mlp)
        pid = pl.program_id(0)
        B = o_ref.shape[0]

        origins = o_ref[:]
        dirs = d_ref[:]
        near = near_ref[:]
        far = far_ref[:]
        gsel = gsel_ref[:]
        enc = enc_ref[:]
        seed = seed_ref[0, 0]

        iotas_list = [_make_iotas(i) for i in infos]
        ciotas_list = [_make_iotas(i) for i in cinfos] if has_cgrid else None
        ray_ids = (
            pid * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        )

        S = cfg.tot_num_samples

        def body(s, carry):
            nlt, depth_acc, feat_acc = carry
            t, delta = _step_depth_delta(cfg, near, far, s)
            pts = origins + t * dirs
            if cfg.contract_coords:
                pts = _contract_pi(pts)
            feat = _sample(grid_ref, infos, iotas_list, pts, gsel,
                           cfg.mask_out_of_bounds_samples)
            cfeat = (
                _sample(cgrid_ref, cinfos, ciotas_list, pts, gsel,
                        cfg.mask_out_of_bounds_samples)
                if has_cgrid else None
            )
            noise = None
            if cfg.inject_noise_sigma > 0.0:
                i1 = S * ray_ids + s + 1
                i2 = i1 + max(cfg.num_rays_noise, MIN_BLOCK_SIZE) * S
                noise = (
                    _int_to_randn(i1, i2, seed) * cfg.inject_noise_sigma
                )
            sigma, color, _ = _decoder_fwd(cfg, feat, cfeat, enc, noise, mlps)
            nlt_new = nlt + sigma * delta
            w = jnp.exp(-nlt) - jnp.exp(-nlt_new)
            return (
                nlt_new,
                depth_acc + w * t,
                feat_acc + w * color,
            )

        init = (
            jnp.zeros((B, 1), jnp.float32),
            jnp.zeros((B, 1), jnp.float32),
            jnp.zeros((B, C_col), jnp.float32),
        )
        nlt, depth_acc, feat_acc = jax.lax.fori_loop(0, S, body, init)
        depth_ref[:] = depth_acc
        nlt_ref[:] = nlt
        feat_ref[:] = feat_acc

    return kernel


def _unpack_mlp_refs(mlp_refs, n_mlp):
    n_t, n_o, n_c = n_mlp
    vals = [r[:] for r in mlp_refs]
    w_t, b_t = vals[:n_t], vals[n_t: 2 * n_t]
    vals = vals[2 * n_t:]
    w_o, b_o = vals[:n_o], vals[n_o: 2 * n_o]
    vals = vals[2 * n_o:]
    w_c, b_c = vals[:n_c], vals[n_c: 2 * n_c]
    return (w_t, b_t, w_o, b_o, w_c, b_c)


def _mlp_arrays(cfg, mlp_params):
    """Split the flat param vector into per-layer [Cin, Cout] weights and
    [1, Cout] biases (kernel inputs)."""
    out = []
    for n_hidden, seg in _iter_mlp_segments(cfg, mlp_params):
        w, b = _flattened_one_mlp_params_to_list(seg, n_hidden)
        out.append(([wi for wi in w], [bi.reshape(1, -1) for bi in b]))
    return out


def _iter_mlp_segments(cfg, mlp_params):
    off = 0
    for nh in (cfg.n_hidden_trunk, cfg.n_hidden_opacity, cfg.n_hidden_color):
        n = _mlp_numel(nh)
        yield nh, mlp_params[off: off + n]
        off += n


def _pack_mlp_grads(cfg, grads_t, grads_o, grads_c):
    """Inverse of :func:`_mlp_arrays`: flat gradient vector."""
    pieces = []
    for grads in (grads_t, grads_o, grads_c):
        ws = [g[0].reshape(-1) for g in grads]
        bs = [g[1].reshape(-1) for g in grads]
        pieces.extend(ws + bs)
    return jnp.concatenate(pieces) if pieces else jnp.zeros((0,), jnp.float32)


def _pad_rays_to_block(arrs, R, B):
    n_pad = (-R) % B
    if n_pad == 0:
        return arrs, R
    return [jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))
            for a in arrs], R + n_pad


def _ray_inputs(cfg, geom, rays_encoding):
    directions, origins, near, far, grid_idx, _scaffold, noise_seed = geom
    R = directions.shape[0]
    arrs = [
        origins, directions, near[:, None], far[:, None],
        grid_idx[:, None].astype(jnp.int32), rays_encoding,
    ]
    arrs, R_pad = _pad_rays_to_block(arrs, R, RAY_BLOCK)
    seed = jnp.asarray(noise_seed, jnp.int32).reshape(1, 1)
    return arrs, seed, R, R_pad


def pallas_render_fwd(cfg, geom, diff):
    grid_flat, color_grid_flat, mlp_params, rays_encoding = diff
    infos = grid_infos(cfg.grid_sizes)
    cinfos = (
        grid_infos(cfg.color_grid_sizes)
        if cfg.color_grid_sizes is not None
        else ()
    )
    (w_t, b_t), (w_o, b_o), (w_c, b_c) = _mlp_arrays(cfg, mlp_params)
    n_mlp = (len(w_t), len(w_o), len(w_c))
    C_col = cfg.n_hidden_color[-1]

    arrs, seed, R, R_pad = _ray_inputs(cfg, geom, rays_encoding)
    n_blocks = R_pad // RAY_BLOCK

    kernel = _build_fw_kernel(cfg, infos, cinfos, n_mlp)

    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    mlp_tensors = [*w_t, *b_t, *w_o, *b_o, *w_c, *b_c]
    in_specs = (
        ray_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full(grid_flat.shape)]
        + ([full(color_grid_flat.shape)]
           if color_grid_flat is not None else [])
        + [full(t.shape) for t in mlp_tensors]
    )
    inputs = arrs + [seed, grid_flat] + (
        [color_grid_flat] if color_grid_flat is not None else []
    ) + mlp_tensors

    out_shape = [
        jax.ShapeDtypeStruct((R_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((R_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((R_pad, C_col), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((RAY_BLOCK, 1), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_BLOCK, 1), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((RAY_BLOCK, C_col), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]

    depth, nlt, feat = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )(*inputs)
    return depth[:R, 0], nlt[:R, 0], feat[:R]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _build_bw_kernel(cfg, infos, cinfos, n_mlp):
    n_t, n_o, n_c = n_mlp
    C_col = cfg.n_hidden_color[-1]
    has_cgrid = cfg.color_grid_sizes is not None

    def kernel(*refs):
        (o_ref, d_ref, near_ref, far_ref, gsel_ref, enc_ref, nltf_ref,
         gdepth_ref, gnlt_ref, gfeat_ref, seed_ref) = refs[:11]
        rest = refs[11:]
        grid_ref = rest[0]
        rest = rest[1:]
        if has_cgrid:
            cgrid_ref = rest[0]
            rest = rest[1:]
        else:
            cgrid_ref = None
        n_w = 2 * (n_t + n_o + n_c)
        mlp_refs = rest[:n_w]
        out_refs = rest[n_w:]
        ggrid_ref = out_refs[0]
        out_refs = out_refs[1:]
        if has_cgrid:
            gcgrid_ref = out_refs[0]
            out_refs = out_refs[1:]
        else:
            gcgrid_ref = None
        gmlp_refs = list(out_refs[:n_w])
        genc_ref = out_refs[n_w]

        mlps = _unpack_mlp_refs(mlp_refs, n_mlp)
        (w_t, b_t, w_o, b_o, w_c, b_c) = mlps
        pid = pl.program_id(0)
        B = o_ref.shape[0]

        # zero the accumulated outputs on the first program
        @pl.when(pid == 0)
        def _():
            ggrid_ref[...] = jnp.zeros_like(ggrid_ref)
            if gcgrid_ref is not None:
                gcgrid_ref[...] = jnp.zeros_like(gcgrid_ref)
            for r in gmlp_refs:
                r[...] = jnp.zeros_like(r)

        origins = o_ref[:]
        dirs = d_ref[:]
        near = near_ref[:]
        far = far_ref[:]
        gsel = gsel_ref[:]
        enc = enc_ref[:]
        seed = seed_ref[0, 0]
        g_depth = gdepth_ref[:]
        g_nlt = gnlt_ref[:]
        g_feat = gfeat_ref[:]

        iotas_list = [_make_iotas(i) for i in infos]
        ciotas_list = [_make_iotas(i) for i in cinfos] if has_cgrid else None
        ray_ids = pid * B + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        S = cfg.tot_num_samples

        def make_zero_mlp_grads():
            zs = []
            for w in (*w_t, *b_t, *w_o, *b_o, *w_c, *b_c):
                zs.append(jnp.zeros_like(w))
            return tuple(zs)

        def body(k, carry):
            s = S - 1 - k
            (nlt_run, suffix, genc_acc, gmlp_acc) = carry
            t, delta = _step_depth_delta(cfg, near, far, s)
            pts = origins + t * dirs
            if cfg.contract_coords:
                pts = _contract_pi(pts)
            feat = _sample(grid_ref, infos, iotas_list, pts, gsel,
                           cfg.mask_out_of_bounds_samples)
            cfeat = (
                _sample(cgrid_ref, cinfos, ciotas_list, pts, gsel,
                        cfg.mask_out_of_bounds_samples)
                if has_cgrid else None
            )
            noise = None
            if cfg.inject_noise_sigma > 0.0:
                i1 = S * ray_ids + s + 1
                i2 = i1 + max(cfg.num_rays_noise, MIN_BLOCK_SIZE) * S
                noise = _int_to_randn(i1, i2, seed) * cfg.inject_noise_sigma

            # ---- recompute forward decoder, saving residuals ----
            sigma, color, res = _decoder_fwd(cfg, feat, cfeat, enc, noise,
                                             mlps)
            sv_t, sv_o, sv_c, op_raw, _, _, _ = res

            # ---- EA adjoint with transmittance rewind ----
            s_s = sigma * delta
            nlt_prev = nlt_run - s_s
            T = jnp.exp(-nlt_run)
            T_prev = jnp.exp(-nlt_prev)
            w = T_prev - T
            g_w = g_depth * t + jnp.sum(g_feat * color, axis=1,
                                        keepdims=True)
            g_s = g_w * T - suffix + g_nlt
            g_sigma = g_s * delta
            g_color = w * g_feat

            # ---- decoder backward (hand-written chain) ----
            g_op_raw = g_sigma * cfg.gain * _d_softplus(op_raw)
            g_col_pre = g_color * color * (1.0 - color)

            if w_o[-1].shape[1] > 1:
                g_op_full = jnp.concatenate(
                    [g_op_raw,
                     jnp.zeros((B, w_o[-1].shape[1] - 1), jnp.float32)],
                    axis=1,
                )
            else:
                g_op_full = g_op_raw

            if not has_cgrid:
                g_ct_in, grads_c = _mlp_bwd(g_col_pre, sv_c, w_c)
                g_ot_in, grads_o = _mlp_bwd(g_op_full, sv_o, w_o)
                g_trunk = g_ct_in + g_ot_in
                if n_t > 0:
                    g_feat_s, grads_t = _mlp_bwd(g_trunk, sv_t, w_t,
                                                 final_relu=True)
                else:
                    grads_t = []
                    g_feat_s = g_trunk * (feat > 0.0).astype(jnp.float32)
                g_cfeat_s = None
                g_enc_step = g_ct_in
            else:
                g_cr_in, grads_c = _mlp_bwd(g_col_pre, sv_c, w_c)
                g_or_in, grads_o = _mlp_bwd(g_op_full, sv_o, w_o)
                grads_t = []
                # relu-field masks
                g_feat_s = g_or_in * (feat > 0.0).astype(jnp.float32)
                g_cfeat_s = g_cr_in * (cfeat > 0.0).astype(jnp.float32)
                g_enc_step = g_cr_in

            # ---- grid-gradient splat (stencil.T matmul) ----
            _splat_accum(ggrid_ref, infos, iotas_list, pts, gsel,
                         cfg.mask_out_of_bounds_samples, g_feat_s)
            if has_cgrid:
                _splat_accum(gcgrid_ref, cinfos, ciotas_list, pts, gsel,
                             cfg.mask_out_of_bounds_samples, g_cfeat_s)

            # order must match (*w_t, *b_t, *w_o, *b_o, *w_c, *b_c)
            flat_grads = (
                [g[0] for g in grads_t] + [g[1] for g in grads_t]
                + [g[0] for g in grads_o] + [g[1] for g in grads_o]
                + [g[0] for g in grads_c] + [g[1] for g in grads_c]
            )
            gmlp_new = tuple(a + g for a, g in zip(gmlp_acc, flat_grads))

            return (
                nlt_prev,
                suffix + g_w * w,
                genc_acc + g_enc_step,
                gmlp_new,
            )

        init = (
            nltf_ref[:],
            jnp.zeros((B, 1), jnp.float32),
            jnp.zeros_like(enc),
            make_zero_mlp_grads(),
        )
        nlt_end, _, genc, gmlp = jax.lax.fori_loop(0, S, body, init)
        genc_ref[:] = genc
        for r, g in zip(gmlp_refs, gmlp):
            r[...] += g.reshape(r.shape)

    return kernel


def pallas_render_bwd(cfg, geom, diff, nlt_final, g_out):
    grid_flat, color_grid_flat, mlp_params, rays_encoding = diff
    g_depth, g_nlt, g_feat = g_out
    infos = grid_infos(cfg.grid_sizes)
    cinfos = (
        grid_infos(cfg.color_grid_sizes)
        if cfg.color_grid_sizes is not None
        else ()
    )
    (w_t, b_t), (w_o, b_o), (w_c, b_c) = _mlp_arrays(cfg, mlp_params)
    n_mlp = (len(w_t), len(w_o), len(w_c))
    C_col = cfg.n_hidden_color[-1]

    arrs, seed, R, R_pad = _ray_inputs(cfg, geom, rays_encoding)
    extra = [
        nlt_final[:, None], g_depth[:, None], g_nlt[:, None], g_feat,
    ]
    extra, _ = _pad_rays_to_block(extra, R, RAY_BLOCK)
    arrs = arrs + extra
    n_blocks = R_pad // RAY_BLOCK

    kernel = _build_bw_kernel(cfg, infos, cinfos, n_mlp)

    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    mlp_tensors = [*w_t, *b_t, *w_o, *b_o, *w_c, *b_c]
    in_specs = (
        ray_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full(grid_flat.shape)]
        + ([full(color_grid_flat.shape)]
           if color_grid_flat is not None else [])
        + [full(t.shape) for t in mlp_tensors]
    )
    inputs = arrs + [seed, grid_flat] + (
        [color_grid_flat] if color_grid_flat is not None else []
    ) + mlp_tensors

    out_shape = [jax.ShapeDtypeStruct(grid_flat.shape, jnp.float32)]
    out_specs = [full(grid_flat.shape)]
    if color_grid_flat is not None:
        out_shape.append(
            jax.ShapeDtypeStruct(color_grid_flat.shape, jnp.float32)
        )
        out_specs.append(full(color_grid_flat.shape))
    for t in mlp_tensors:
        out_shape.append(jax.ShapeDtypeStruct(t.shape, jnp.float32))
        out_specs.append(full(t.shape))
    out_shape.append(
        jax.ShapeDtypeStruct((R_pad, rays_encoding.shape[1]), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((RAY_BLOCK, rays_encoding.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )(*inputs)

    outs = list(outs)
    g_grid = outs.pop(0)
    g_cgrid = outs.pop(0) if color_grid_flat is not None else None
    n_w = len(mlp_tensors)
    g_mlp_tensors = outs[:n_w]
    g_enc = outs[n_w][:R]

    # repack per-layer grads into the flat mlp_params layout
    n_t, n_o, n_c = n_mlp
    gw_t = g_mlp_tensors[:n_t]
    gb_t = g_mlp_tensors[n_t: 2 * n_t]
    rest = g_mlp_tensors[2 * n_t:]
    gw_o = rest[:n_o]
    gb_o = rest[n_o: 2 * n_o]
    rest = rest[2 * n_o:]
    gw_c = rest[:n_c]
    gb_c = rest[n_c: 2 * n_c]
    g_mlp = jnp.concatenate(
        [g.reshape(-1) for g in (*gw_t, *gb_t)]
        + [g.reshape(-1) for g in (*gw_o, *gb_o)]
        + [g.reshape(-1) for g in (*gw_c, *gb_c)]
    )
    return g_grid, g_cgrid, g_mlp, g_enc
