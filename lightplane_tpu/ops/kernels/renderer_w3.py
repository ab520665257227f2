"""W3: fused rendering of beyond-VMEM grids (boxed-DMA sampler).

The dense/windowed renderer kernels cap each sub-grid at
``MAX_CELLS_PER_GRID`` because their sampling stencil is ``[M, V_g]``
(``renderer_pallas.py``).  This module removes the cap — round 3 covers
voxel grids, all three plane orientations, batched grids, grid-lists and
contracted (unbounded-scene) configs.  The reference samples any-size
grids from GPU global memory
(``triton_src/shared/grid_sample_util.py:1088-1186``, consumed by
``templates/renderer_fw.py:254-265`` and the bw splat at
``templates/renderer_bw.py:477-534``); the TPU-native equivalent keeps the
grid in HBM and exploits march coherence:

* The grid is laid out ``[D, H, W*C]`` — x folded into lanes, so the HBM
  buffer has no 128-lane padding waste and a z/y/x box is one DMA: rows
  ``[wz, wy]`` (y 8-aligned for the sublane tiling) and a 128-aligned
  dynamic lane slice ``[x0*C, wx*C)`` for the x window.

* A host-side planner bounds every (ray-block, chunk)'s **alive** sampling
  corners.  Samples outside ``(-1, S)`` on any axis have an all-zero
  trilinear stencil (they sample exactly 0 — the zeros-padding OOB
  semantics), so the plan intersects each ray's alive depth interval with
  the chunk's depth range and only bounds the remainder: background
  (``num_samples_inf``) and beyond-the-volume samples never break the fit.

* The kernel samples in two stages: a z/y hat-stencil matmul
  ``st_zy [M, wz*wy] @ box [wz*wy, wx*C]`` on the MXU, then a cheap
  strided x-hat contraction over the ``wx`` lane blocks on the VPU.  The
  backward reverses both stages and read-modify-writes the gradient box
  in HBM (two DMAs) — Pallas grid programs run sequentially per core, so
  the revisiting accumulation is deterministic and race-free (the
  replacement for the reference's ``tl.atomic_add`` splats).

A single runtime fit flag selects (one ``lax.cond``) between these kernels
and the XLA-scan fallback, so arbitrary (incoherent / contracted) rays
remain correct.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window extents (cells).  z starts are unaligned (untiled leading dim);
# y starts are 8-aligned (sublane tiling), so WY covers span + 7 slack;
# x starts are (128/C)-aligned lane offsets.  Round-5 defaults
# (256-ray blocks = 16x16-pixel tiles, Z12/Y16/WX16 budgets): the CPU
# fit-frontier sweep (scratch/sweep_w3_budget_fit.py) showed (12,16,16)
# fits ALL 120 orbit poses (5 elevations x 24 azimuths) at HALF the
# round-4 (16,24,16) stencil-matmul volume, and the on-chip measurement
# at the 64^3 x 32ch / 256^2 / 256-sample benchmark confirms 380k rays/s
# fwd+bwd vs 291k at the old defaults.  Tighter budgets are faster still
# (Z12/Y16/WX12 reaches 428k) but fit only 48/120 poses; the env
# overrides below let a deployment with a constrained camera rig choose
# them.  The runtime fit flag guards correctness either way.
import os as _os

W3_Z = int(_os.environ.get("LT_W3_Z", "12"))
W3_Y = int(_os.environ.get("LT_W3_Y", "16"))
RAY_BLOCK_W3 = int(_os.environ.get("LT_W3_BLOCK", "256"))
W3_WX_MIN = int(_os.environ.get("LT_W3_WX", "16"))


def _w3_tile(block):
    """Squarest (rows, cols) pixel tile for a ray block (rows a multiple
    of 8) — compact frustum footprints keep the window spans small."""
    th = 8
    while th * 2 <= block // (th * 2):
        th *= 2
    return (th, block // th)


W3_TILE = _w3_tile(RAY_BLOCK_W3)
_BIG = 3.0e37


@dataclasses.dataclass(frozen=True)
class _W3Geo:
    """Kernel-frame geometry of ONE sub-grid.

    ``D``/``H``/``W`` are the KERNEL-frame cell extents (z, y, x) of the
    ``[D, H, W*C]`` HBM layout.  ``src`` maps each kernel axis to the
    sampling-coordinate axis feeding it (0=x, 1=y, 2=z), or -1 for a
    plane's collapsed singleton axis (always kernel-z).  A batch folds
    into kernel-z (``D = batch * Dz``); the z hat stencil is masked to
    the ray's own batch region so edge corners cannot alias into a
    neighbouring batch element.
    """

    D: int
    H: int
    W: int
    C: int          # channels of the (possibly t1-folded) grid
    WX: int         # x window cells
    AX: int         # x start alignment (cells)
    # z/y window extents: the renderer uses the module defaults; the
    # boxed-DMA splatter (splatter_big.py) builds geos with larger,
    # budget-driven windows for its coarser chunks/tiles
    WZ: int = W3_Z
    WY: int = W3_Y
    src: Tuple[int, int, int] = (2, 1, 0)
    batch: int = 1
    Dz: int = -1    # per-batch kernel-z cells (-1: equals D)

    @property
    def zy(self):
        return self.WZ * self.WY

    @property
    def dz(self):
        return self.D if self.Dz < 0 else self.Dz


def _w3_geo(size, C, budget=None) -> Optional[_W3Geo]:
    """Kernel geometry for one (possibly batched) voxel or plane grid.

    Window extents flex to the grid (round 4: kills the alignment
    cliffs — the reference samples ANY shape from global memory,
    ``grid_sample_util.py:1088-1186``):

    * y: 8-aligned starts must reach the top span, so the window absorbs
      the height's mod-8 remainder (``W3_Y .. W3_Y+7`` cells); heights
      below ``W3_Y`` get a whole-axis window (start always 0).
    * x: the lane-aligned width grows to make ``(Wk - wx) % AX == 0``;
      widths below the minimum get the whole axis.
    * z: starts are unaligned; thin grids (``Dz < W3_Z``) get a
      whole-axis window — which always fits.

    Whole-axis windows make arbitrarily small sub-grids legal, so a
    grid-list mixing tiny (e.g. a coarse 8^3 pyramid level) and big
    sub-grids runs fused instead of dropping the whole list to the scan.
    """
    bz, by, bx = budget if budget is not None else (W3_Z, W3_Y, W3_WX_MIN)
    b, d, h, w, _c = size
    ax = 128 // math.gcd(C, 128)
    dims = [(2, d), (1, h), (0, w)]
    actives = [(axis, s) for axis, s in dims if s > 1]
    if len(actives) == 3:
        src = (2, 1, 0)
        Dz, Hk, Wk = d, h, w
    elif len(actives) == 2:
        (ay, sy), (axx, sx) = actives
        src = (-1, ay, axx)
        Dz, Hk, Wk = 1, sy, sx
    else:
        return None
    wy = Hk if Hk <= by else by + (Hk - by) % 8
    wx = -(-bx // ax) * ax   # lane-aligned minimum width
    if wx >= Wk:
        wx = Wk
    elif (Wk - wx) % ax:
        wx = Wk - ((Wk - wx) // ax) * ax
    kD = b * Dz
    wz = min(bz, Dz)
    return _W3Geo(D=kD, H=Hk, W=Wk, C=C, WX=wx, AX=ax, WZ=wz, WY=wy,
                  src=src, batch=b, Dz=Dz)


def w3_geos(cfg, c_main: int, c_color: Optional[int]):
    """(main_geos, color_geos) lists, or None when W3 cannot run this
    config.

    Covers any grid-list mix of voxel grids and planes (all three
    orientations), batched or not, contracted or not (round 3: the
    planner bounds contracted coordinates exactly per step).  ``c_main``
    is the main grids' channel count AFTER any trunk-layer folding.
    """
    if getattr(cfg, "compute_dtype", "float32") == "bfloat16":
        return None  # f32 box scratch; bf16 grids keep the scan path
    budget = getattr(cfg, "w3_budget", None)
    main = [_w3_geo(s, c_main, budget) for s in cfg.grid_sizes]
    if any(g is None for g in main):
        return None
    color = []
    if cfg.color_grid_sizes is not None:
        color = [_w3_geo(s, c_color, budget) for s in cfg.color_grid_sizes]
        if any(g is None for g in color):
            return None
    return main, color


def w3_supported(cfg) -> bool:
    """Static feasibility (used by ``pallas_renderer_supported``): channel
    counts here are the raw grid channels — the t1 fold preserves
    alignment feasibility because hidden widths are powers of two too."""
    c_main = int(cfg.grid_sizes[0][-1])
    if cfg.color_grid_sizes is None and len(cfg.n_hidden_trunk) > 1:
        c_main = int(cfg.n_hidden_trunk[1])  # t1-folded width
    c_color = (
        int(cfg.color_grid_sizes[0][-1])
        if cfg.color_grid_sizes else None
    )
    return w3_geos(cfg, c_main, c_color) is not None


def w3_plan(cfg, origins, dirs, near, far, K, bw, geos, B, gsel=None):
    """Host-side window starts + global fit flag.

    For each (ray-block, chunk, grid): ``(z0, y0, x0)`` int32 starts
    (y0 8-aligned, x0 AX-aligned) bounding every ALIVE sampling corner.

    * Linear (uncontracted) coordinates: alive = the sample's coordinates
      are inside ``(-1, S)`` on every active axis; other samples have
      identically-zero stencils under any window.  Each ray's alive range
      is one interval whose endpoint coordinates bound the chunk's alive
      extremes.
    * Contracted configs (round 3): coordinates are no longer linear in
      depth, but only the SAMPLED points need bounding — the plan maps
      every chunk step through the contraction and bounds the images
      exactly (contracted points always land inside the volume, so no
      alive intersection is needed).
    * Batched grids fold the ray's batch index into kernel-z (``gsel``
      required); a block mixing batch indices fails the fit and falls
      back.  A plane's collapsed kernel-z axis contributes the constant 0.

    Returns ``(w0 [n_blocks_pad8, nc*3*G pad128] int32, fits_all)``.
    """
    from .renderer_pallas import _grouped_ray_plan

    n_blocks = origins.shape[0] // B
    if gsel is None:
        arrays = (origins, dirs, near, far)
        pads = (0.0, 0.0, 1.0, 1.0)
        inner = lambda o, d, nr, fr: _w3_plan_inner(
            cfg, o, d, nr, fr, K, bw, geos, B, None)
    else:
        arrays = (origins, dirs, near, far, gsel)
        pads = (0.0, 0.0, 1.0, 1.0, 0)
        inner = lambda o, d, nr, fr, gs: _w3_plan_inner(
            cfg, o, d, nr, fr, K, bw, geos, B, gs)
    w0, fits_all = _grouped_ray_plan(inner, B, arrays, pads)
    w0 = jnp.pad(w0, ((0, (-n_blocks) % 8), (0, (-w0.shape[1]) % 128)))
    return w0, fits_all


def _w3_plan_inner(cfg, origins, dirs, near, far, K, bw, geos, B, gsel):
    from .renderer_pallas import (
        _contract_pi,
        _host_chunk_all_depths,
        _host_chunk_endpoint_depths,
    )

    R = origins.shape[0]
    n_blocks = R // B
    contract = bool(getattr(cfg, "contract_coords", False))
    if contract:
        t = _host_chunk_all_depths(cfg, near, far, K, bw)  # [R, nc, Kc]
        pts = (
            origins[:, None, None, :] + t[..., None] * dirs[:, None, None, :]
        )
        pts = _contract_pi(pts)                            # [R, nc, Kc, 3]
    else:
        t = _host_chunk_endpoint_depths(cfg, near, far, K, bw)
    nc = t.shape[1]
    t_lo = jnp.min(t, axis=2)
    t_hi = jnp.max(t, axis=2)
    gsel_f = None if gsel is None else gsel.astype(jnp.float32)

    cols = []
    fits = []

    def lower(fmin, fmax, S_k, wsize, align):
        empty = fmax < fmin                   # whole block-chunk dead
        lo = jnp.floor(jnp.clip(fmin, -2.0, S_k + 2.0)).astype(jnp.int32)
        hi = jnp.floor(
            jnp.clip(fmax, -2.0, S_k + 2.0)
        ).astype(jnp.int32) + 1
        # the upper clip must itself be aligned, or the kernel's
        # pl.multiple_of start hints would lie for S % align != 0
        w0 = jnp.clip(
            (lo // align) * align, 0, ((S_k - wsize) // align) * align
        )
        cols.append(jnp.where(empty, 0, w0))
        fits.append(empty | (jnp.minimum(hi, S_k - 1) - w0 < wsize))

    for geo in geos:
        # (src, local cells, kernel cells, window, align, fold batch?)
        axes = (
            (geo.src[0], geo.dz, geo.D, geo.WZ, 1, geo.batch > 1),
            (geo.src[1], geo.H, geo.H, geo.WY, 8, False),
            (geo.src[2], geo.W, geo.W, geo.WX, geo.AX, False),
        )
        if contract:
            for (src, S_loc, S_k, wsize, align, fold) in axes:
                if src < 0:
                    f = jnp.zeros((R, nc, t.shape[2]), jnp.float32)
                else:
                    f = ((pts[..., src] + 1.0) * 0.5) * S_loc - 0.5
                if fold:
                    f = f + gsel_f[:, None, None] * S_loc
                fr = f.reshape(n_blocks, B, nc, -1)
                lower(fr.min(axis=(1, 3)), fr.max(axis=(1, 3)),
                      S_k, wsize, align)
            continue

        ab = []
        enter = jnp.full((R,), -_BIG)
        exit_ = jnp.full((R,), _BIG)
        for (src, S, _sk, _w, _a, _fold) in axes:
            if src < 0:
                ab.append(None)
                continue
            a = ((origins[:, src] + 1.0) * 0.5) * S - 0.5
            b = dirs[:, src] * (0.5 * S)
            ab.append((a, b))
            pos = b > 1e-12
            neg = b < -1e-12
            bs = jnp.where(jnp.abs(b) > 1e-12, b, 1.0)
            t_at_lo = (-1.0 - a) / bs     # f == -1
            t_at_hi = (S * 1.0 - a) / bs  # f == S
            e = jnp.where(pos, t_at_lo, jnp.where(neg, t_at_hi, -_BIG))
            x = jnp.where(pos, t_at_hi, jnp.where(neg, t_at_lo, _BIG))
            flat_dead = (~pos) & (~neg) & ~((a > -1.0) & (a < S))
            e = jnp.where(flat_dead, _BIG, e)
            x = jnp.where(flat_dead, -_BIG, x)
            enter = jnp.maximum(enter, e)
            exit_ = jnp.minimum(exit_, x)
        ta = jnp.maximum(enter[:, None], t_lo)            # [R, nc]
        tb = jnp.minimum(exit_[:, None], t_hi)
        dead = ta > tb
        for (src, S_loc, S_k, wsize, align, fold), ab_i in zip(axes, ab):
            if ab_i is None:
                f1 = f2 = jnp.zeros((R, nc), jnp.float32)
            else:
                a, b = ab_i
                f1 = a[:, None] + ta * b[:, None]
                f2 = a[:, None] + tb * b[:, None]
            if fold:
                f1 = f1 + gsel_f[:, None] * S_loc
                f2 = f2 + gsel_f[:, None] * S_loc
            fmin = jnp.where(dead, _BIG, jnp.minimum(f1, f2))
            fmax = jnp.where(dead, -_BIG, jnp.maximum(f1, f2))
            fmin = fmin.reshape(n_blocks, B, nc).min(axis=1)
            fmax = fmax.reshape(n_blocks, B, nc).max(axis=1)
            lower(fmin, fmax, S_k, wsize, align)
    # [n_blocks, nc, G*3] -> [n_blocks, nc * G * 3] chunk-major
    w0 = jnp.stack(cols, axis=-1).reshape(n_blocks, -1)
    return w0, jnp.all(jnp.stack(fits))


class _W3Sampler:
    """Per-(chunk, grid) boxed-DMA voxel sampler (``_GridSampler``
    interface: sample / splat_accum / splat_accum_pieces).

    The constructor starts the box DMA(s) so they overlap the chunk's
    geometry and stencil work; ``sample`` waits once.  ``gout_ref`` /
    ``gbox_ref`` are only given in the backward kernel.
    """

    def __init__(self, geo: _W3Geo, hbm_ref, box_ref, sem, pts_ks,
                 w0z, w0y, w0x, gout_ref=None, gbox_ref=None, gsem=None,
                 gsel_m=None):
        self.geo = geo
        self.box_ref = box_ref
        self.pts_ks = pts_ks   # kept for the ablation hooks' M derivation
        self.w0z, self.w0y, self.w0x = w0z, w0y, w0x
        self.gout_ref = gout_ref
        self.gbox_ref = gbox_ref
        self.gsem = gsem
        cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, 0)

        def coord(src, S):
            if src < 0:
                return None
            p = cat([pk[:, src: src + 1] for pk in pts_ks])
            return ((p + 1.0) * 0.5) * S - 0.5        # [M, 1] grid frame

        self.fx = coord(geo.src[2], geo.W)
        self.fy = coord(geo.src[1], geo.H)
        fz = coord(geo.src[0], geo.dz)
        self._zlo = None
        if geo.batch > 1:
            base = gsel_m.astype(jnp.float32) * float(geo.dz)
            fz = base if fz is None else fz + base
            if geo.dz > 1:
                # batch-region mask: an edge corner's +1 cell must not
                # alias into the neighbouring batch element
                self._zlo = gsel_m * geo.dz           # int32 [M, 1]
        self.fz = fz   # None: collapsed singleton axis (hz == 1)
        self._st_zy = None
        self._hx = None
        self._hxe = None
        self._waited = False

        def box_slice(ref):
            return ref.at[
                pl.ds(w0z, geo.WZ),
                pl.ds(pl.multiple_of(w0y, 8), geo.WY),
                pl.ds(pl.multiple_of(w0x * geo.C, 128), geo.WX * geo.C),
            ]

        self._box_slice = box_slice
        if hbm_ref is not None:
            self._dma = pltpu.make_async_copy(
                box_slice(hbm_ref), box_ref, sem)
            self._dma.start()
        if gbox_ref is not None:
            # backward: prefetch the gradient box for the RMW splat.  The
            # previous chunk's store was awaited, so overlap is safe.
            self._gdma = pltpu.make_async_copy(
                box_slice(gout_ref), gbox_ref, gsem)
            self._gdma.start()

    def _stencil_zy(self):
        if self._st_zy is None:
            geo = self.geo
            li = jax.lax.broadcasted_iota(jnp.int32, (1, geo.zy), 1)
            yv = (li % geo.WY).astype(jnp.float32) + self.w0y.astype(
                jnp.float32)
            zv = (li // geo.WY).astype(jnp.float32) + self.w0z.astype(
                jnp.float32)
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(yv - self.fy))
            if self.fz is None:
                self._st_zy = hy          # collapsed z: hz == 1 everywhere
            else:
                hz = jnp.maximum(0.0, 1.0 - jnp.abs(zv - self.fz))
                if self._zlo is not None:
                    lo = self._zlo.astype(jnp.float32)
                    hz = hz * (
                        (zv >= lo) & (zv < lo + geo.dz)
                    ).astype(jnp.float32)
                self._st_zy = hz * hy                   # [M, zy]
        return self._st_zy

    def _hx_cols(self):
        if self._hx is None:
            x0 = self.w0x.astype(jnp.float32)
            self._hx = [
                jnp.maximum(0.0, 1.0 - jnp.abs(x0 + xc - self.fx))
                for xc in range(self.geo.WX)
            ]                                           # WX x [M, 1]
        return self._hx

    def _hx_expanded(self):
        """x hat expanded over the folded ``WX*C`` lane layout (lane l
        belongs to window x-cell ``l // C``) — one iota expression
        instead of WX per-column lane slices.  Usable when C divides the
        128-lane tile so tile-aligned folds respect x-cell boundaries."""
        if self._hxe is None:
            geo = self.geo
            li = jax.lax.broadcasted_iota(
                jnp.int32, (1, geo.WX * geo.C), 1
            )
            x_of_l = (li // geo.C).astype(jnp.float32)
            self._hxe = jnp.maximum(
                0.0,
                1.0 - jnp.abs(x_of_l + self.w0x.astype(jnp.float32)
                              - self.fx),
            )                                           # [M, WX*C]
        return self._hxe

    def _fold_x(self, t):
        """Contract the folded x axis: ``[M, WX*C] -> [M, C]`` by
        summing lanes congruent mod C.  Full 128-lane tiles fold with
        ALIGNED adds (legal because 128 % C == 0 keeps whole x-cells per
        tile); the final tile folds with 128//C - 1 narrow adds."""
        geo = self.geo
        L = geo.WX * geo.C
        nt = L // 128
        acc = t[:, 0:128]
        for k in range(1, nt):
            acc = acc + t[:, k * 128:(k + 1) * 128]
        out = acc[:, 0:geo.C]
        for j in range(1, 128 // geo.C):
            out = out + acc[:, j * geo.C:(j + 1) * geo.C]
        return out

    def _use_folded_x(self):
        geo = self.geo
        return 128 % geo.C == 0 and (geo.WX * geo.C) % 128 == 0

    def sample(self, ref):
        del ref  # the HBM ref was bound at construction (DMA in flight)
        from .renderer_pallas import ABLATE

        geo = self.geo
        if not self._waited:
            self._dma.wait()
            self._waited = True
        M = self.pts_ks[0].shape[0] * len(self.pts_ks)
        if "nostencil" in ABLATE:   # DMA waited; skip zy matmul + x fold
            return jnp.full((M, geo.C), 0.1, jnp.float32)
        g_win = self.box_ref[...].reshape(geo.zy, geo.WX * geo.C)
        s1 = jnp.dot(self._stencil_zy(), g_win,
                     preferred_element_type=jnp.float32)  # [M, WX*C]
        if "noxfold" in ABLATE:     # zy matmul kept; skip x contraction
            return s1[:, 0:geo.C]
        if self._use_folded_x():
            return self._fold_x(self._hx_expanded() * s1)  # [M, C]
        hx = self._hx_cols()
        out = None
        for xc in range(geo.WX):
            t = hx[xc] * s1[:, xc * geo.C:(xc + 1) * geo.C]
            out = t if out is None else out + t
        return out                                       # [M, C]

    def _rep(self, dval):
        """Lane-replicate [M, C] -> [M, WX*C] (interpret-safe)."""
        from .renderer_pallas import INTERPRET

        if INTERPRET:
            return jnp.concatenate([dval] * self.geo.WX, axis=1)
        return pltpu.repeat(dval, self.geo.WX, axis=1)

    def _s1_grad(self, dval):
        if self._use_folded_x():
            # adjoint of the folded-x contraction: expand the cotangent
            # over the lane layout and weight by the expanded x hat
            return self._hx_expanded() * self._rep(dval)
        hx = self._hx_cols()
        return jnp.concatenate(
            [hx[xc] * dval for xc in range(self.geo.WX)], axis=1
        )                                                # [M, WX*C]

    def _rmw(self, upd):
        geo = self.geo
        self._gdma.wait()
        self.gbox_ref[...] += upd.reshape(geo.WZ, geo.WY, geo.WX * geo.C)
        store = pltpu.make_async_copy(
            self.gbox_ref, self._box_slice(self.gout_ref), self.gsem)
        store.start()
        store.wait()

    def splat_accum(self, grad_ref, dval):
        del grad_ref  # bound at construction (gout_ref)
        upd = jax.lax.dot_general(
            self._stencil_zy(), self._s1_grad(dval),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [zy, WX*C]
        self._rmw(upd)

    def splat_accum_pieces(self, grad_ref, pieces, Mq):
        del grad_ref
        st = self._stencil_zy()
        upd = None
        for q, dq in enumerate(pieces):
            s1g = self._s1g_piece(dq, q, Mq)
            t = jax.lax.dot_general(
                st[q * Mq:(q + 1) * Mq], s1g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            upd = t if upd is None else upd + t
        self._rmw(upd)

    def _s1g_piece(self, dq, q, Mq):
        if self._use_folded_x():
            return self._hx_expanded()[q * Mq:(q + 1) * Mq] \
                * self._rep(dq)
        hx = self._hx_cols()
        return jnp.concatenate(
            [hx[xc][q * Mq:(q + 1) * Mq] * dq
             for xc in range(self.geo.WX)], axis=1,
        )


def make_w3_samplers(geos, hbm_refs, box_refs, sems, pts_ks, w0_ref, pid,
                     ci, gout_refs=None, gbox_refs=None, gsems=None,
                     gsel_m=None):
    """Per-chunk W3 samplers (main list then color list).

    ``hbm_refs[gi]=None`` builds a splat-only sampler (no sample DMA) —
    the boxed-DMA splatter's forward uses only the RMW ``splat_accum``
    path against ``gout_refs``.  ``gsel_m`` ([M, 1] int32, chunk-tiled)
    is required when any geo is batched."""
    n_g = len(geos)
    out = []
    for gi, geo in enumerate(geos):
        base = ci * 3 * n_g + 3 * gi
        out.append(_W3Sampler(
            geo, hbm_refs[gi], box_refs[gi],
            None if sems is None else sems.at[gi], pts_ks,
            w0_ref[pid % 8, base],
            w0_ref[pid % 8, base + 1],
            w0_ref[pid % 8, base + 2],
            gout_ref=None if gout_refs is None else gout_refs[gi],
            gbox_ref=None if gbox_refs is None else gbox_refs[gi],
            gsem=None if gsems is None else gsems.at[gi],
            gsel_m=gsel_m,
        ))
    return out


def w3_scratch_shapes(geos, bw):
    """Box (and bw: gradient-box) VMEM buffers + DMA semaphores."""
    shapes = [
        pltpu.VMEM((g.WZ, g.WY, g.WX * g.C), jnp.float32) for g in geos
    ]
    if bw:
        shapes += [
            pltpu.VMEM((g.WZ, g.WY, g.WX * g.C), jnp.float32)
            for g in geos
        ]
    shapes.append(pltpu.SemaphoreType.DMA((len(geos),)))
    if bw:
        shapes.append(pltpu.SemaphoreType.DMA((len(geos),)))
    return shapes
