"""Big-grid Pallas splatter: HBM-resident accumulation via windowed DMA.

The VMEM-resident splatter kernel (``splatter_pallas.py``) caps the output
grid at ``MAX_CELLS_PER_GRID`` cells; the reference's headline splatter
config (``tests/splatter_speed_benchmark.py:200-250``: a 160^3 x 64ch voxel
grid) is ~4.1M cells — far beyond VMEM.  This kernel keeps the accumulator
grids in HBM as 4D ``[D, H, W, C+1]`` buffers and exploits march coherence:

* A host-side planner (:func:`box_plan`) bounds every (ray-block, chunk)'s
  sampling corners inside a static ``wz x wy x wx`` box using the chunk's
  endpoint coordinates (exact — coordinates are linear in depth).
* Per chunk, the kernel builds the trilinear stencil against the box only
  (``[K*B, wz*wy*wx]``), computes ``stencil.T @ [feat | 1]`` on the MXU and
  read-modify-writes the box in HBM with two async DMAs.  TPU grid
  programs execute sequentially per core and the DMAs are awaited, so the
  revisiting accumulation is race-free and deterministic — the TPU-native
  replacement for the reference's ``tl.atomic_add`` splats
  (``grid_sample_util.py:40-99``).
* A single global fit flag selects (one XLA-level ``lax.cond``) between
  this kernel and the XLA-scan fallback, so arbitrary (incoherent) rays
  remain correct.

The backward of a splat is a gather: the bw kernel DMAs the same boxes of
the incoming gradient grid and computes ``stencil @ box`` per chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import renderer_pallas as rp
from .renderer_pallas import (
    RAY_BLOCK,
    _GridInfo,
    _hat,
    _make_iotas,
    _oob_mask,
    _step_depth_delta,
    grid_infos,
)

# Steps per chunk and the box cell budget.  Boxes window the z and y axes
# only — HBM DMA slices must keep the last two (x, channel) dims whole
# (Mosaic lane-tiling constraint) — so a box is [wz, wy, W, C+1].  A
# chunk's along-ray span in cells is ~K * (far-near)/S * dim/2; K=2 with
# 7x7 z/y windows fits raster view rays marching 160^3 at 96 samples.
SPLAT_CHUNK = 2


def _pad128(n):
    """HBM<->VMEM box DMAs need the minor (channel) dim in multiples of
    the 128-lane tiling; accumulator channels are padded accordingly."""
    return ((n + 127) // 128) * 128
BOX_CELL_BUDGET = 8192
MIN_CELLS_FOR_BIG = 64 * 64 * 64  # below this the VMEM kernel handles it


def box_params(info: _GridInfo):
    """z/y box sizes ``(wz, wy)`` or None if not boxable."""
    if info.batch > 1:
        return None
    if info.cells < MIN_CELLS_FOR_BIG:
        return None
    if info.D <= 1 or info.H <= 1 or info.W <= 1:
        return None  # planes are handled by the VMEM kernel
    side = max(2, int(np.floor((BOX_CELL_BUDGET / info.W) ** 0.5)))
    wz = min(info.D, side)
    wy = min(info.H, side)
    if wz * wy * info.W >= info.cells:
        return None
    return wz, wy


def big_splat_supported(cfg) -> bool:
    """Every output grid must be boxable; no MLP; no contraction (the
    host-side endpoint bound needs depth-linear coordinates)."""
    if len(cfg.n_hidden) > 0 or cfg.contract_coords:
        return False
    infos = grid_infos(cfg.output_grid_sizes)
    return all(box_params(i) is not None for i in infos)


def box_plan(cfg, origins, dirs, near, far, infos):
    """Host-side box starts + global fit flag.

    Returns ``(w0 [n_blocks, n_chunks * n_grids * 3] int32, fits_all)``;
    layout chunk-major, grid-middle, axis-minor.
    """
    K = min(SPLAT_CHUNK, cfg.tot_num_samples)
    t = rp._host_chunk_endpoint_depths(cfg, near, far, K, False)
    R, n_chunks = t.shape[0], t.shape[1]
    n_blocks = R // RAY_BLOCK

    cols = []
    fits = []
    for info in infos:
        wz, wy = box_params(info)
        # axis order: 0 -> z (coord index 2), 1 -> y (coord index 1)
        for wdim, wsize, ci in ((wz, info.D, 2), (wy, info.H, 1)):
            p = origins[:, None, None, ci] + t * dirs[:, None, None, ci]
            f = ((p + 1.0) * 0.5) * wsize - 0.5
            f = f.reshape(n_blocks, RAY_BLOCK, n_chunks, 2)
            fmin = jnp.min(f, axis=(1, 3))
            fmax = jnp.max(f, axis=(1, 3))
            lo = jnp.floor(fmin).astype(jnp.int32)
            hi = jnp.floor(fmax).astype(jnp.int32) + 1
            w0 = jnp.clip(lo, 0, wsize - wdim)
            cols.append(w0)
            fits.append(jnp.minimum(hi, wsize - 1) - w0 < wdim)
    # [n_blocks, nc, G*2] -> [n_blocks, nc * G * 2]
    w0 = jnp.stack(cols, axis=-1).reshape(n_blocks, -1)
    fits_all = jnp.all(jnp.stack(fits))
    return w0, fits_all, K, n_chunks


def _box_iotas(info, box):
    wz, wy = box
    return _make_iotas(_GridInfo(0, 1, wz, wy, info.W))


def _box_stencil(info, box, rel_iotas, w0z, w0y, pts):
    """Trilinear stencil of one chunk against the (dynamic) z/y box."""
    bv, zv, yv, xv = rel_iotas
    zv = zv + w0z
    yv = yv + w0y
    x, y, z = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
    fx = ((x + 1.0) * 0.5) * info.W - 0.5
    fy = ((y + 1.0) * 0.5) * info.H - 0.5
    fz = ((z + 1.0) * 0.5) * info.D - 0.5
    return _hat(xv, fx) * _hat(yv, fy) * _hat(zv, fz)


def _chunk_pts(cfg, K, ci, origins, dirs, near, far, k_col):
    S = cfg.tot_num_samples
    s = ci * K + k_col
    valid = s < S
    s_c = jnp.clip(s, 0, S - 1)
    t, _ = _step_depth_delta(cfg, near, far, s_c)
    pts = origins + t * dirs
    return pts, valid


class _SplatCfgView:
    """Adapter exposing the _SplatCfg fields _step_depth_delta expects."""

    def __init__(self, cfg):
        self.num_samples = cfg.num_samples
        self.num_samples_inf = cfg.num_samples_inf
        self.disparity_at_inf = cfg.disparity_at_inf
        self.tot_num_samples = cfg.tot_num_samples


def _build_big_fw_kernel(cfg, infos, boxes, n_chunks, K):
    C1 = _pad128(cfg.out_chn + 1)
    G = len(infos)
    mask_oob = cfg.mask_out_of_bounds_samples

    def kernel(o_ref, d_ref, near_ref, far_ref, feat_ref, valid_ref,
               w0_ref, *rest):
        # rest = G aliased input refs, G output refs (same buffers), G
        # VMEM scratch boxes, 1 DMA semaphore array
        grid_refs = rest[G: 2 * G]          # outputs, ANY (HBM)
        scratch_refs = rest[2 * G: 3 * G]   # VMEM box buffers
        sems = rest[3 * G]                  # DMA semaphores, one per grid

        pid = pl.program_id(0)
        B = o_ref.shape[0]
        tile = lambda a: (
            jnp.concatenate([a] * K, axis=0) if K > 1 else a
        )
        origins = tile(o_ref[:])
        dirs = tile(d_ref[:])
        near = tile(near_ref[:])
        far = tile(far_ref[:])
        B0 = o_ref.shape[0]
        pad = C1 - (cfg.out_chn + 1)
        vals = jnp.concatenate(
            [feat_ref[:] * valid_ref[:], valid_ref[:]]
            + ([jnp.zeros((B0, pad), jnp.float32)] if pad else []),
            axis=1,
        )
        vals = tile(vals)               # [K*B, C1pad], constant per ray
        k_col = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0) // B
        rel_iotas = [_box_iotas(i, b) for i, b in zip(infos, boxes)]
        scfg = _SplatCfgView(cfg)

        def body(ci, _):
            pts, valid = _chunk_pts(scfg, K, ci, origins, dirs, near, far,
                                    k_col)
            v = vals * valid.astype(jnp.float32)
            if mask_oob:
                v = v * _oob_mask(pts).astype(jnp.float32)
            for gi in range(G):
                info, box = infos[gi], boxes[gi]
                wz, wy = box
                base = (ci * G + gi) * 2
                w0z = w0_ref[pid, base]
                w0y = w0_ref[pid, base + 1]
                st = _box_stencil(info, box, rel_iotas[gi], w0z, w0y, pts)
                upd = jax.lax.dot_general(
                    st, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                        # [wz*wy*W, C+1]
                box_slice = (
                    pl.ds(w0z, wz), pl.ds(w0y, wy), slice(None),
                    slice(None),
                )
                load = pltpu.make_async_copy(
                    grid_refs[gi].at[box_slice], scratch_refs[gi],
                    sems.at[gi],
                )
                load.start()
                load.wait()
                scratch_refs[gi][...] = (
                    scratch_refs[gi][...]
                    + upd.reshape(wz, wy, info.W, C1)
                )
                store = pltpu.make_async_copy(
                    scratch_refs[gi], grid_refs[gi].at[box_slice],
                    sems.at[gi],
                )
                store.start()
                store.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


def _build_big_bw_kernel(cfg, infos, boxes, n_chunks, K):
    C = _pad128(cfg.out_chn)
    G = len(infos)
    mask_oob = cfg.mask_out_of_bounds_samples

    def kernel(o_ref, d_ref, near_ref, far_ref, valid_ref, w0_ref,
               *rest):
        ggrid_refs = rest[:G]            # incoming grad grids, ANY (HBM)
        genc_ref = rest[G]               # output [B, C] VMEM
        scratch_refs = rest[G + 1: 2 * G + 1]
        sems = rest[2 * G + 1]

        pid = pl.program_id(0)
        B = o_ref.shape[0]
        tile = lambda a: (
            jnp.concatenate([a] * K, axis=0) if K > 1 else a
        )
        origins = tile(o_ref[:])
        dirs = tile(d_ref[:])
        near = tile(near_ref[:])
        far = tile(far_ref[:])
        k_col = jax.lax.broadcasted_iota(jnp.int32, (K * B, 1), 0) // B
        rel_iotas = [_box_iotas(i, b) for i, b in zip(infos, boxes)]
        scfg = _SplatCfgView(cfg)

        def body(ci, acc):
            pts, valid = _chunk_pts(scfg, K, ci, origins, dirs, near, far,
                                    k_col)
            g_vec = jnp.zeros((K * B, C), jnp.float32)
            for gi in range(G):
                info, box = infos[gi], boxes[gi]
                wz, wy = box
                base = (ci * G + gi) * 2
                w0z = w0_ref[pid, base]
                w0y = w0_ref[pid, base + 1]
                box_slice = (
                    pl.ds(w0z, wz), pl.ds(w0y, wy), slice(None),
                    slice(None),
                )
                load = pltpu.make_async_copy(
                    ggrid_refs[gi].at[box_slice], scratch_refs[gi],
                    sems.at[gi],
                )
                load.start()
                load.wait()
                st = _box_stencil(info, box, rel_iotas[gi], w0z, w0y, pts)
                gbox = scratch_refs[gi][...].reshape(wz * wy * info.W, C)
                g_vec = g_vec + jnp.dot(
                    st, gbox, preferred_element_type=jnp.float32
                )
            g_vec = g_vec * valid.astype(jnp.float32)
            if mask_oob:
                g_vec = g_vec * _oob_mask(pts).astype(jnp.float32)
            # reduce the chunk's rows per ray
            return acc + sum(
                g_vec[k * B: (k + 1) * B] for k in range(K)
            )

        acc = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((B, C), jnp.float32)
        )
        genc_ref[:] = acc * valid_ref[:]

    return kernel


def _ray_arrs(geom, splatting_feature):
    directions, origins, near, far, grid_idx, valid_mask = geom
    R = directions.shape[0]
    arrs = [origins, directions, near[:, None], far[:, None],
            splatting_feature]
    arrs, R_pad = rp._pad_rays_to_block(arrs, R, RAY_BLOCK)
    valid_p, _ = rp._pad_rays_to_block(
        [valid_mask[:, None]], R, RAY_BLOCK, mode="constant"
    )
    return arrs, valid_p[0], R, R_pad


def big_splat_fwd(cfg, geom, diff, w0, K, n_chunks):
    """The boxed-DMA fw pass; returns flat (feat_grid [V, C], w_grid)."""
    splatting_feature, _input_grid_flat, _mlp = diff
    infos = grid_infos(cfg.output_grid_sizes)
    boxes = [box_params(i) for i in infos]
    C1 = _pad128(cfg.out_chn + 1)
    G = len(infos)

    arrs, valid, R, R_pad = _ray_arrs(geom, splatting_feature)
    n_blocks = R_pad // RAY_BLOCK

    # zero-initialized HBM accumulators, aliased to the outputs
    zeros = [
        jnp.zeros((i.D, i.H, i.W, C1), jnp.float32) for i in infos
    ]

    kernel = _build_big_fw_kernel(cfg, infos, boxes, n_chunks, K)
    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs + [valid]
    ]
    in_specs = (
        ray_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in infos]
    )
    out_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in infos]
    out_shape = [
        jax.ShapeDtypeStruct((i.D, i.H, i.W, C1), jnp.float32)
        for i in infos
    ]
    n_ray_inputs = len(arrs) + 2  # + valid + w0
    grids = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b[0], b[1], i.W, C1), jnp.float32)
            for b, i in zip(boxes, infos)
        ] + [pltpu.SemaphoreType.DMA((G,))],
        input_output_aliases={n_ray_inputs + gi: gi for gi in range(G)},
        compiler_params=rp._COMPILER_PARAMS,
        interpret=rp.INTERPRET,
    )(*(arrs + [valid, w0] + zeros))
    grids = grids if isinstance(grids, (list, tuple)) else [grids]
    flat = jnp.concatenate([g.reshape(-1, C1) for g in grids], axis=0)
    return (
        flat[:, : cfg.out_chn],
        flat[:, cfg.out_chn: cfg.out_chn + 1],
    )


def big_splat_bwd(cfg, geom, g_feat_grid, w0, K, n_chunks):
    """Boxed-DMA bw pass (the adjoint gather); returns g_encoding."""
    infos = grid_infos(cfg.output_grid_sizes)
    boxes = [box_params(i) for i in infos]
    C = cfg.out_chn
    Cp = _pad128(C)
    G = len(infos)
    directions = geom[0]
    R = directions.shape[0]

    # split the flat grad into per-grid 4D views, channel-padded for the
    # box DMAs
    if Cp > C:
        g_feat_grid = jnp.pad(g_feat_grid, ((0, 0), (0, Cp - C)))
    gg = []
    off = 0
    for i in infos:
        n = i.cells
        gg.append(g_feat_grid[off: off + n].reshape(i.D, i.H, i.W, Cp))
        off += n

    arrs, valid, R, R_pad = _ray_arrs(
        geom, jnp.zeros((R, 1), g_feat_grid.dtype)
    )
    arrs = arrs[:4]  # o, d, near, far (no feature input in bw)
    n_blocks = R_pad // RAY_BLOCK

    kernel = _build_big_bw_kernel(cfg, infos, boxes, n_chunks, K)
    ray_specs = [
        pl.BlockSpec((RAY_BLOCK, a.shape[1]), lambda b: (b, 0),
                     memory_space=pltpu.VMEM)
        for a in arrs + [valid]
    ]
    in_specs = (
        ray_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in infos]
    )
    g_enc = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((RAY_BLOCK, Cp), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, Cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b[0], b[1], i.W, Cp), jnp.float32)
            for b, i in zip(boxes, infos)
        ] + [pltpu.SemaphoreType.DMA((G,))],
        compiler_params=rp._COMPILER_PARAMS,
        interpret=rp.INTERPRET,
    )(*(arrs + [valid, w0] + gg))
    return g_enc[:R, :C]
