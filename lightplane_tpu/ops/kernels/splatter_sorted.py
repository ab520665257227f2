"""Sorted-splat Pallas kernels: big-grid splatting for arbitrary ray order.

The boxed-DMA splatter (``splatter_big.py``) needs spatially-coherent ray
*blocks* — each (ray-block, chunk) must fit a small DMA box, which random
ray order or coordinate contraction violates (the planner's global fit
flag then falls back to XLA scatter, ~1000x slower on TPU).  This kernel
removes the coherence requirement by sorting *samples*, not rays — the
TPU-native analogue of a GPU binned/tiled rasterizer, replacing the
reference's global-memory ``tl.atomic_add`` splats
(``grid_sample_util.py:40-99``) with deterministic dense algebra:

1. **Phase A (XLA)**: march all ``R x S`` sample points, bucket each into
   the octet of cells containing its lower sampling corner, and key
   octets by their z/y *slab* (full x extent).  One ``lax.sort`` orders
   samples by (slab, octet); per-octet runs are padded to 128-sample
   *bins* (slot->sample maps are all gathers + vectorized binary
   searches — no scatters anywhere).
2. **Phase B (Pallas)**: the grid walks 32-bin groups in sorted order.
   The kernel keeps the current slab's ``[BZ, BY, PXp*CPAD]`` cell box
   (+1 z/y halo; x and channels FOLDED into the lane dim so the HBM
   accumulator is packed at CPAD = round16(C+1) lanes per cell instead
   of a full 128-lane tile) as VMEM scratch — RMW'd from/to the HBM
   accumulator on the slab's first/last group — and splats each bin with
   one FACTORED MXU matmul ``st_zy^T @ (hx * values_rep)`` against the
   bin's ``WZ x WY x WX``-cell window (z/y trilinear hats on the left,
   the x hat expanded over the folded x*channel lanes on the right —
   the outer-product trilinear stencil is never materialized).  Each
   slab owns one contiguous group run, so the accumulation is
   race-free.

**Grid-shape coverage** (round 3): every reference grid shape splats
fused — voxel grids, all three plane orientations (``(1,H,W)``,
``(D,1,W)``, ``(D,H,1)`` — reference plane-axis dispatch
``grid_sample_util.py:1088-1186``), batched grids (``B > 1``), and
multi-grid lists (one sort + one kernel pass per sub-grid, sharing the
sample stream).  Each grid maps its axes onto a canonical *kernel frame*
``(kz, ky, kx)``: a plane's singleton axis collapses to a 1-cell kernel-z
(its two active axes become ky/kx in grid order), and a batch folds into
kernel-z with a ``D+1`` per-batch stride so the +1 trilinear halo lands
on a padding plane instead of the next batch element.

The scheme is *exact* for every ray order, OOB policy, and contraction
(out-of-window corners get zero hat weight, reproducing the zeros-padding
semantics of ``ops/grid_sample.py``), so unlike the boxed path there is no
runtime fit flag and no fallback branch.

The backward of a splat is a gather: the bw kernel loads the same boxes of
the (padded) gradient grid and emits per-sample ``stencil @ box_window``
rows, un-sorted outside with one gather and summed over steps per ray.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import renderer_pallas as rp
from .renderer_pallas import MAX_CELLS_PER_GRID

# Octet (bucket) cell extents; 8-aligned so window x-starts respect the
# sublane tiling of the box scratch's x axis.
OCT = 8
BIN = 128                     # samples per stencil matmul
GBINS = 32                    # bins per Pallas grid step
CPAD_MAX = 128                # channel capability cap (one lane tile)
_BOX_BUDGET = 40 * 1024 * 1024   # VMEM bytes for the slab scratch
_ACC_BUDGET = 6 * 1024 ** 3      # HBM bytes for all padded accumulators
_BIG = 1.0e9                  # coord sentinel: zero hat weight everywhere
# Accumulator cell-lane mode: "auto" (default) uses FULL 128-lane cells
# for SMALL sample counts and packed round16 lanes for large ones; "1" /
# "0" force.  Full cells let the folded->grid-frame relayout run as the
# streaming Pallas kernels below (128-aligned shape casts; the XLA
# retile is a ~22/~40 ms view-independent fixed cost at the 160^3 bench
# shape — measured +7.5%% fwd+bwd at 1 view), but cost ~1.6x accumulator
# HBM and box DMA, a net loss at large sample counts (-0.6%% at 16
# views, +4 GB peak).  The auto threshold: one 128^2 x 96-sample view.
_CPAD128_ENV = _os.environ.get("LIGHTPLANE_SORTED_CPAD128", "auto")
_CPAD128_MAX_SAMPLES = int(_os.environ.get(
    "LIGHTPLANE_SORTED_CPAD128_MAX_SAMPLES", str(2 * 1024 * 1024)))


def _use_cpad128(cfg) -> bool:
    if _CPAD128_ENV in ("0", "1"):
        return _CPAD128_ENV == "1"
    R = getattr(cfg, "total_rays", None)
    if R is None:
        return False
    return R * cfg.tot_num_samples <= _CPAD128_MAX_SAMPLES
_G9 = 9                       # per-ray geometry row width (o, d, near,
                              # far, grid_idx)


@dataclasses.dataclass(frozen=True)
class _SortedGeo:
    """Kernel-frame geometry of ONE sub-grid.

    ``src`` maps each kernel axis (z, y, x) to the grid *coordinate* axis
    feeding it (0=x, 1=y, 2=z in the sampling convention) — or -1 for a
    plane's collapsed singleton axis (always kernel-z).  ``Dz``/``Hk``/
    ``Wk`` are the kernel-frame cell extents of one batch element;
    batches stack along kernel-z at stride ``Dz + 1``.
    """

    B: int                    # batch elements
    gD: int                   # grid-frame shape (for crop/pad layout)
    gH: int
    gW: int
    C: int                    # feature channels
    C1: int                   # C + 1 (fused weight channel)
    src: Tuple[int, int, int]
    Dz: int                   # kernel-z cells per batch element
    Hk: int
    Wk: int
    SUPZ: int                 # slab cells per kernel z/y axis
    SUPY: int
    nsz: int
    nsy: int
    PZ: int
    PY: int
    PXp: int                  # padded x extent (whole-dim DMA'd)
    # accumulator channel padding: C1 rounded up to 16 lanes.  The
    # accumulator folds x and channels into ONE lane dimension
    # ``[PZ, PY, PXp * CPAD]`` (round 4): Mosaic requires a separate
    # trailing channel dim to be a full 128-lane tile, but a folded lane
    # dim is packed — 80 lanes instead of 128 at the reference
    # 64-channel config cuts accumulator HBM, its DMA traffic, and the
    # splat matmul's output tiles by 38%.  CPAD % 16 == 0 keeps every
    # dynamic window lane offset (``dx * CPAD``, dx a multiple of 8)
    # 128-aligned.
    CPAD: int = CPAD_MAX
    # x-supercell extent (cells) and segment count (round 5).  The slab
    # box's full-x RMW traffic is view-count-independent (~2 x box bytes
    # per touched slab), which dominates SMALL ray batches; x-segmented
    # supercells bound each visit's box to (SUPX + OCT) x-cells (the +OCT
    # halo absorbs bins whose WX window crosses the segment edge — the
    # overlapped halo columns are RMW'd by both neighbours, race-free on
    # the sequential grid).  SUPX = 0 means one full-x segment — the
    # pre-round-5 behaviour, bit-identical.  SUPX % 8 == 0 keeps the
    # dynamic box lane offset (bx * CPAD) 128-aligned.
    SUPX: int = 0
    nsx: int = 1

    @property
    def supx(self):           # effective x-supercell extent (cells)
        return self.SUPX or (-(-self.Wk // OCT) * OCT)

    @property
    def BXL(self):            # box x*channel lane extent (+OCT x halo)
        return (self.supx + OCT) * self.CPAD

    @property
    def Dk(self):
        """Total kernel-z cell extent (batches + their halo planes)."""
        return self.B * (self.Dz + 1) if self.B > 1 else self.Dz

    @property
    def zstride(self):
        return self.Dz + 1

    @property
    def BZ(self):             # box z extent (+1 halo unless singleton)
        return self.SUPZ + 1 if self.Dk > 1 else 1

    @property
    def BY(self):
        # +1 y halo, rounded to the sublane tile: the folded rank-3
        # box's y axis is the tiled sublane dim, whose DMA slice extents
        # must be multiples of 8 (the extra rows round-trip unchanged)
        return -(-(self.SUPY + 1) // 8) * 8

    @property
    def LX(self):             # folded x*channel lane extent of the box
        return self.PXp * self.CPAD

    @property
    def WZ(self):             # bin window extents
        return OCT + 1 if self.Dk > 1 else 1

    @property
    def WY(self):
        return OCT + 1

    @property
    def WX(self):
        return 2 * OCT

    @property
    def wcells(self):
        return self.WZ * self.WY * self.WX

    @property
    def lz_n(self):           # octet locals per slab axis
        return self.SUPZ // OCT if self.Dk > 1 else 1

    @property
    def ly_n(self):
        return self.SUPY // OCT

    @property
    def n_sup(self):
        return self.nsz * self.nsy * self.nsx

    @property
    def n_loc_x(self):
        # x-octets per supercell segment (for the full-x default this is
        # every x-octet that can contain a sample's lower corner; the
        # +OCT halo of PXp never holds one, so it gets no octet)
        return self.supx // OCT

    @property
    def n_loc(self):
        return self.lz_n * self.ly_n * self.n_loc_x

    @property
    def n_keys(self):
        return self.n_sup * self.n_loc

    @property
    def acc_bytes(self):
        return self.PZ * self.PY * self.PXp * self.CPAD * 4


def _kernel_axes(b, d, h, w) -> Optional[Tuple[Tuple[int, int, int],
                                               int, int, int]]:
    """(src, Dz, Hk, Wk) for one grid shape, or None if unsupported.

    Grid dims (d, h, w) sample coordinates (z=2, y=1, x=0).  A plane's
    two active axes keep their grid order as (ky, kx); its singleton
    collapses to kernel-z.
    """
    dims = [(2, d), (1, h), (0, w)]
    actives = [(ax, s) for ax, s in dims if s > 1]
    if len(actives) == 3:
        return (2, 1, 0), d, h, w
    if len(actives) == 2:
        (ay, sy), (ax_, sx) = actives
        return (-1, ay, ax_), 1, sy, sx
    return None


def sorted_geos(cfg) -> Optional[List[_SortedGeo]]:
    """Per-sub-grid kernel geometry, or None when any grid is
    unsupported (fewer than 2 active axes, channels beyond CPAD, or the
    padded accumulators exceed the HBM budget)."""
    if cfg.out_chn + 1 > CPAD_MAX:
        return None
    # Packed (round16) channel lanes minimize accumulator HBM and box
    # DMA; FULL 128-lane cells instead make the folded->grid-frame
    # relayout expressible as Mosaic-supported 128-aligned shape casts,
    # enabling the streaming crop/pad kernels below (the XLA retile is a
    # ~22/~40 ms view-independent fixed cost at the 160^3 bench shape).
    if _use_cpad128(cfg):
        cpad = CPAD_MAX
    else:
        cpad = -(-(cfg.out_chn + 1) // 16) * 16
    geos = []
    total = 0
    for (b, d, h, w, c) in cfg.output_grid_sizes:
        ka = _kernel_axes(b, d, h, w)
        if ka is None:
            return None
        src, Dz, Hk, Wk = ka
        Dk = b * (Dz + 1) if b > 1 else Dz
        full_x = -(-Wk // OCT) * OCT
        # LIGHTPLANE_SORTED_SUPX: opt-in x-supercell extent (cells; 0 =
        # one full-x segment, the default).  Tuning knob for small ray
        # batches, where the full-x slab RMW traffic dominates.
        supx_env = int(_os.environ.get("LIGHTPLANE_SORTED_SUPX", "0"))
        if supx_env > 0:
            supx = min(full_x, max(OCT, (supx_env // OCT) * OCT))
        else:
            supx = full_x
        nsx = -(-Wk // supx)
        pxp = nsx * supx + OCT
        bxl_cells = supx + OCT
        zcap = max(OCT, -(-Dk // OCT) * OCT)
        ycap = max(OCT, -(-Hk // OCT) * OCT)
        supz = supy = 0
        for s in (32, 16, 8):
            sz = 1 if Dk == 1 else min(s, zcap)
            sy = min(s, ycap)
            bz = sz + 1 if Dk > 1 else 1
            by8 = -(-(sy + 1) // 8) * 8
            if bz * by8 * bxl_cells * cpad * 4 <= _BOX_BUDGET:
                supz, supy = sz, sy
                break
        if supy == 0:
            return None
        nsz = -(-Dk // supz)
        nsy = -(-Hk // supy)
        by8 = -(-(supy + 1) // 8) * 8
        geo = _SortedGeo(
            B=b, gD=d, gH=h, gW=w, C=c, C1=c + 1, src=src,
            Dz=Dz, Hk=Hk, Wk=Wk, SUPZ=supz, SUPY=supy, nsz=nsz, nsy=nsy,
            PZ=nsz * supz + 1, PY=(nsy - 1) * supy + by8, PXp=pxp,
            CPAD=cpad, SUPX=supx, nsx=nsx,
        )
        total += geo.acc_bytes
        geos.append(geo)
    if total > _ACC_BUDGET:
        return None
    return geos


def sorted_splat_supported(cfg) -> bool:
    """Capability: voxel grids, all plane orientations, batches, and
    multi-grid lists with C+1 <= 128 channels — any ray order or
    contraction.  MLP (fused input-grid) variants are supported: the
    per-sample fused vectors are computed XLA-side as one batched MLP
    over the chunk's sample stream (``ops/splatter.py:
    _fused_sample_chunk``) and enter the kernel as per-sample value rows
    (:func:`sorted_vals_sample`)."""
    return sorted_geos(cfg) is not None


def _caps(geo: _SortedGeo, N: int):
    """Static slot-capacity bounds: every octet wastes < 1 bin of padding,
    every slab < 1 group."""
    n_bins_cap = N // BIN + geo.n_keys
    n_groups_cap = -(-n_bins_cap // GBINS) + geo.n_sup
    return n_bins_cap, n_groups_cap


def _march_points(cfg, origins, directions, near, far, step):
    """Sample points for (ray geometry, step) — the shared elementwise
    expression.  The pre-sort key pass and the post-sort per-slot
    recompute must produce *bitwise-identical* floats so a sample's hat
    weights match the octet key it was sorted under — both call this one
    function (and :func:`_kernel_coords`) with identical expressions.
    """
    from ..naive_renderer import _contract_pi

    ns, ni = cfg.num_samples, cfg.num_samples_inf
    s = step.astype(jnp.float32)
    if ns > 1:
        lin = near + (far - near) * (s / (ns - 1))
    else:
        lin = jnp.broadcast_to(near, s.shape)
    if ni > 0:
        frac = (s - ns + 1.0) / ni
        n_disp = cfg.disparity_at_inf * frac + (1.0 - frac)
        t = jnp.where(s < ns, lin, far * (1.0 / n_disp))
    else:
        t = lin
    pts = origins + t[..., None] * directions
    if cfg.contract_coords:
        pts = _contract_pi(pts)
    return pts


def _kernel_coords(geo: _SortedGeo, pts, gidx):
    """Kernel-frame (align_corners=False) coords of sample points.

    ``gidx`` selects the batch element; batches stack along kernel-z at
    ``zstride`` so trilinear halos land on padding planes.
    """
    def f(axis_src, size):
        if axis_src < 0:
            return jnp.zeros(pts.shape[:-1], jnp.float32)
        return ((pts[..., axis_src] + 1.0) * 0.5) * size - 0.5

    fz = f(geo.src[0], geo.Dz)
    fy = f(geo.src[1], geo.Hk)
    fx = f(geo.src[2], geo.Wk)
    if geo.B > 1:
        # The +1 halo plane only absorbs corners one cell past the batch
        # edge; a sample with fz outside (-1, Dz) would alias into the
        # NEIGHBOURING batch's cells after the fold, so it is sent to the
        # sentinel instead (zeros-padding semantics: its hat weights are
        # identically zero against its own batch anyway).
        inside = (fz > -1.0) & (fz < geo.Dz)
        fz = jnp.where(
            inside, fz + gidx.astype(jnp.float32) * geo.zstride, _BIG
        )
    return fz, fy, fx


def sorted_plan(cfg, geo: _SortedGeo, geom, want_pos: bool = True,
                feat_aug=None):
    """Phase A: sort samples into octet bins; build all kernel-side tables.

    Performance shape (measured on v5e at the 160^3x64 bench chunking,
    ~4.2M samples/chunk): the plan sorts ONLY ``(key, sample_id)`` and
    *recomputes* each slot's coordinates from a 9-wide per-ray geometry
    table, instead of carrying coordinates through the sort (a 5-stream
    ``lax.sort`` costs ~15x a 2-stream one).  SCALAR gathers from small
    tables (``take(bounds, key_s)`` etc.) fuse into XLA elementwise
    loop fusions on TPU and are nearly free in context; ROW gathers
    (``[N, k]`` takes) do NOT fuse and cost ~4-7 ns per row — round 4
    tried replacing the scalar lookups with fused row gathers and
    measured the whole plan 1.7x SLOWER end to end (137.7 vs 81.6
    ms/chunk), so the scalar-gather formulation is load-bearing, not
    incidental.  Dead samples (invalid rays, masked OOB, zero-stencil)
    get key ``n_keys`` — a trailing bucket that is never binned,
    shrinking the padded stream instead of splatting zeros.

    Returns a dict of device arrays (static shapes from ``_caps``):
      fzT/fyT/fxT  [n_groups_cap*BIN, GBINS] kernel-frame sample coords,
                   transposed so bin q's samples are column q of its group
      table        [ngc8, 128] i32 per-group SMEM rows
                   (slab z/y starts, first, last, GBINS x (dz, dy, dx))
      sample_pad   [Npad] i32 sample id per padded slot (N = pad sentinel)
      vals         [Npad, cpv] f32 splat values per slot, lanes [0, CPAD)
                   (only when ``feat_aug`` — the no-MLP values [R, C1] —
                   is given)
      pos_orig     [N] i32 padded slot of each original sample
                   (``Npad`` = dead: points at the bw pass's zero row)
    """
    directions, origins, near, far, grid_idx, valid_mask = geom
    R = directions.shape[0]
    S = cfg.tot_num_samples
    N = R * S
    n_bins_cap, n_groups_cap = _caps(geo, N)
    n_bins_pad = n_groups_cap * GBINS
    Npad = n_bins_pad * BIN
    lz_n, ly_n, lx_n = geo.lz_n, geo.ly_n, geo.n_loc_x

    step = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (R, S))
    pts = _march_points(
        cfg, origins[:, None, :], directions[:, None, :],
        near[:, None], far[:, None], step,
    )
    fz, fy, fx = _kernel_coords(geo, pts, grid_idx[:, None])

    cz = jnp.clip(jnp.floor(fz), 0, geo.Dk - 1).astype(jnp.int32)
    cy = jnp.clip(jnp.floor(fy), 0, geo.Hk - 1).astype(jnp.int32)
    cx = jnp.clip(jnp.floor(fx), 0, geo.Wk - 1).astype(jnp.int32)
    sz, sy = cz // geo.SUPZ, cy // geo.SUPY
    sx = cx // geo.supx
    lz = (cz // OCT) % lz_n if geo.Dk > 1 else cz * 0
    ly = (cy // OCT) % ly_n
    lx = (cx // OCT) % lx_n
    key = (((sz * geo.nsy + sy) * geo.nsx + sx) * geo.n_loc
           + (lz * ly_n + ly) * lx_n + lx)

    # dead samples -> trailing bucket (sorted past every live key, binned
    # never).  Besides invalid rays and (when masked) OOB samples, any
    # sample whose trilinear stencil is identically zero — outside the
    # (-1, S) live window on some kernel axis — contributes nothing and
    # is dropped here: marches typically overshoot the volume on both
    # ends (the reference bench marches [0.5, 3.5] through a 2-unit
    # cube), so this empties a large fraction of the bins, which the
    # kernels then skip per group.
    dead = ~(valid_mask[:, None] > 0)
    if cfg.mask_out_of_bounds_samples:
        inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1)
        dead = dead | ~inb
    live = (
        (fz > -1.0) & (fz < geo.Dk)
        & (fy > -1.0) & (fy < geo.Hk)
        & (fx > -1.0) & (fx < geo.Wk)
    )
    dead = dead | ~live
    key = jnp.where(dead, geo.n_keys, key).reshape(N)

    idx = jnp.arange(N, dtype=jnp.int32)
    # stability is not required: bins are order-independent and every
    # consumer reads the one shared sorted stream (unstable sorts are
    # still deterministic for fixed inputs).  A num_keys=2 tie-break was
    # tried for gather locality and made no measurable difference.
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=1, is_stable=False)

    # per-octet sample counts from the sorted keys (binary searches; no
    # scatters).  The n_keys bucket (dead) is excluded by construction.
    bounds = jnp.searchsorted(
        key_s, jnp.arange(geo.n_keys + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = jnp.diff(bounds)                                  # [n_keys]
    nb = -(-counts // BIN)                                     # bins/octet
    nb_sup = nb.reshape(geo.n_sup, geo.n_loc)
    bins_sup = nb_sup.sum(axis=1)
    groups_sup = -(-bins_sup // GBINS)
    gstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(groups_sup)]
    ).astype(jnp.int32)                                        # [n_sup+1]
    n_groups_used = gstart[-1]
    # first bin id of each octet (slab group padding included)
    obo = jnp.cumsum(nb_sup, axis=1) - nb_sup
    octet_bin_start = (
        (gstart[:-1] * GBINS)[:, None] + obo
    ).reshape(geo.n_keys).astype(jnp.int32)

    # padded slot of each sorted sample (for the bw un-sort); dead samples
    # point past the stream at the bw zero row.  Only the backward needs
    # this inverse map — its second full sort is skipped in fw-only plans
    # (want_pos=False).
    pos_orig = None
    if want_pos:
        # in-bucket rank: SCALAR gathers from the small ``bounds`` /
        # ``octet_bin_start`` tables — these fuse into the surrounding
        # elementwise ops (see the docstring; a fused [N, 2] row gather
        # was tried and REJECTED: row gathers do not fuse).
        # NOTE cumulative formulations (rank = iota - cummax(run-start
        # iota), via lax.cummax or associative_scan) were tried and
        # REJECTED: the TPU backend's cumulative-op lowering takes ~27 s
        # to compile at 1M elements and minutes at this plan's 4.2M —
        # the scalar gather compiles instantly.
        rank = idx - jnp.take(bounds, jnp.minimum(key_s, geo.n_keys))
        pos = (
            jnp.take(octet_bin_start, jnp.minimum(key_s, geo.n_keys - 1))
            + rank // BIN
        ) * BIN + rank % BIN
        pos = jnp.where(key_s == geo.n_keys, Npad, pos)
        # orig-sample -> slot: invert the sort with a second sort (an
        # inverse-permutation scatter was tried and REJECTED: 25 ms vs
        # ~6 ms for the sort on v5e)
        _, pos_orig = jax.lax.sort(
            (idx_s, pos), num_keys=1, is_stable=False
        )

    # slot -> source sample (gather construction of the padded streams).
    # NOTE a vmap(dynamic_slice) row formulation was tried here and
    # REJECTED: Mosaic's compile time for batched unaligned slices grows
    # superlinearly (60 s at 8k rows, ~20 min at this plan's 44k rows —
    # it serializes the whole compile service) and its steady-state is no
    # faster than the scalar take (14.9 vs 13.2 ms/M on v5e).
    b = jnp.arange(n_bins_pad, dtype=jnp.int32)
    bin_oct = (
        jnp.searchsorted(octet_bin_start, b, side="right") - 1
    ).astype(jnp.int32)
    bin_oct = jnp.clip(bin_oct, 0, geo.n_keys - 1)
    rank0 = (b - jnp.take(octet_bin_start, bin_oct)) * BIN
    src_base = jnp.take(bounds, bin_oct) + rank0
    cnt_b = jnp.take(counts, bin_oct)
    j = jnp.arange(BIN, dtype=jnp.int32)[None]
    valid_slot = (rank0[:, None] + j) < cnt_b[:, None]

    src = jnp.where(valid_slot, src_base[:, None] + j, N).reshape(Npad)

    # per-slot sample id: one scalar gather over the (nearly-sorted) slot
    # map; sentinel sample N -> ray R -> the geometry/value pad row
    idx_s_app = jnp.concatenate(
        [idx_s, jnp.full((1,), N, jnp.int32)]
    )
    slot_sample = jnp.take(idx_s_app, src)                     # [Npad]
    # pad slots gather the ZERO sentinel row (R) rather than a real
    # ray's features: the _BIG coordinate masking already zeroes their
    # hat weights, but defense-in-depth keeps a masking bug from
    # silently splatting a real ray (ADVICE r2)
    ray_pad = jnp.where(
        slot_sample >= N, R, jnp.minimum(slot_sample // S, R - 1)
    )                                                          # [Npad]

    def groupT(col):
        return (
            col.reshape(n_groups_cap, GBINS, BIN)
            .transpose(0, 2, 1)
            .reshape(n_groups_cap * BIN, GBINS)
        )

    vals = None
    if feat_aug is not None:
        # value rows padded to a full lane tile: 128-aligned rows gather
        # ~1.5x faster than odd widths (measured v5e), and the kernel's
        # vals blocks stay tile-shaped (lanes [0, CPAD) hold the values)
        cpv = -(-geo.CPAD // 128) * 128
        tblv = jnp.pad(
            feat_aug.astype(jnp.float32),
            ((0, 1), (0, cpv - geo.C1)),
        )
        vals = jnp.take(tblv, ray_pad, axis=0)                 # [Npad, cpv]

    # recompute coords per slot, directly in the kernel's transposed
    # layout: a 9-wide row gather from the [R+1, 9] geometry table plus
    # elementwise math (bitwise-equal to the key pass — see
    # _march_points / _kernel_coords)
    sampleT = groupT(slot_sample)                              # [ngcB, GB]
    rayT = jnp.minimum(sampleT // S, R)
    stepT = sampleT % S
    g9 = jnp.concatenate(
        [origins, directions, near[:, None], far[:, None],
         grid_idx[:, None].astype(jnp.float32)], axis=1,
    ).astype(jnp.float32)
    g9 = jnp.concatenate([g9, jnp.zeros((1, _G9), jnp.float32)], axis=0)
    g9T = jnp.take(g9, rayT.reshape(-1), axis=0).reshape(
        rayT.shape + (_G9,)
    )
    ptsT = _march_points(
        cfg, g9T[..., 0:3], g9T[..., 3:6], g9T[..., 6], g9T[..., 7], stepT,
    )
    fzT, fyT, fxT = _kernel_coords(
        geo, ptsT, g9T[..., 8].astype(jnp.int32)
    )
    pad_slot = sampleT == N
    fzT = jnp.where(pad_slot, _BIG, fzT)
    fyT = jnp.where(pad_slot, _BIG, fyT)
    fxT = jnp.where(pad_slot, _BIG, fxT)

    # per-group SMEM table
    g = jnp.arange(n_groups_cap, dtype=jnp.int32)
    sup = jnp.clip(
        jnp.searchsorted(gstart, g, side="right") - 1, 0, geo.n_sup - 1
    ).astype(jnp.int32)
    in_use = g < n_groups_used
    first = (g == jnp.take(gstart, sup)) & in_use
    last = (g == jnp.take(gstart, sup + 1) - 1) & in_use
    s_z = sup // (geo.nsy * geo.nsx)
    s_y = (sup // geo.nsx) % geo.nsy
    s_x = sup % geo.nsx
    bx_g = s_x * geo.supx                       # box x start (cells)
    if geo.nsx > 1:
        # the kernels' x hats are BOX-LOCAL when segmented: shift each
        # group's sample x coordinates by its segment start (pad slots'
        # _BIG sentinel stays effectively _BIG)
        fxT = (
            fxT.reshape(n_groups_cap, BIN, GBINS)
            - bx_g.astype(jnp.float32)[:, None, None]
        ).reshape(n_groups_cap * BIN, GBINS)
    oct_g = bin_oct.reshape(n_groups_cap, GBINS)
    loc = oct_g % geo.n_loc
    dz = (loc // (ly_n * lx_n)) * OCT
    dy = ((loc // lx_n) % ly_n) * OCT
    dx = (loc % lx_n) * OCT
    cols = [
        s_z * geo.SUPZ, s_y * geo.SUPY,
        first.astype(jnp.int32), last.astype(jnp.int32),
        in_use.astype(jnp.int32),
    ]
    table = jnp.concatenate(
        [jnp.stack(cols, axis=1), dz, dy, dx, bx_g[:, None]], axis=1
    ).astype(jnp.int32)                                     # [ngc, 6+96]
    ngc8 = -(-n_groups_cap // 8) * 8
    table = jnp.pad(
        table, ((0, ngc8 - n_groups_cap), (0, 128 - table.shape[1]))
    )

    out = {
        "fzT": fzT, "fyT": fyT, "fxT": fxT, "table": table,
        "sample_pad": slot_sample, "pos_orig": pos_orig,
    }
    if vals is not None:
        out["vals"] = vals
    return out


def _sds(shape, dtype, *like):
    """ShapeDtypeStruct whose varying-across-mesh-axes (vma) set is the
    union of the given arrays' — required for ``pallas_call`` outputs
    inside ``jax.shard_map`` (check_vma=True), a no-op elsewhere."""
    vma = frozenset()
    for x in like:
        try:
            v = jax.typeof(x).vma
        except Exception:
            v = None
        if v:
            vma = vma | v
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _zy_hx(geo: _SortedGeo, fz, fy, fx, bz, by, dz, dy, dx, zy_iota,
           xl_iota):
    """Factored bin stencils: ``st_zy [BIN, WZ*WY]`` (z/y hats) and
    ``hx [BIN, WX*CPAD]`` (the x hat expanded over the folded x*channel
    lane layout).  The full trilinear stencil is their outer product —
    never materialized: the splat matmul contracts samples directly,
    ``st_zy^T @ (hx * vals_rep)``, so MXU output tiles scale with CPAD
    (80) instead of a full 128-lane tile, and the z/y stencil build is
    ~16x fewer VPU elements than the fused 3-axis stencil."""
    yr = (zy_iota % geo.WY).astype(jnp.float32)
    hy = jnp.maximum(
        0.0, 1.0 - jnp.abs(yr + (by + dy).astype(jnp.float32) - fy)
    )
    if geo.WZ > 1:
        zr = (zy_iota // geo.WY).astype(jnp.float32)
        hz = jnp.maximum(
            0.0, 1.0 - jnp.abs(zr + (bz + dz).astype(jnp.float32) - fz)
        )
        st_zy = hz * hy
    else:
        st_zy = hy
    x_of_l = (xl_iota // geo.CPAD).astype(jnp.float32)
    hx = jnp.maximum(
        0.0, 1.0 - jnp.abs(x_of_l + dx.astype(jnp.float32) - fx)
    )
    return st_zy, hx


def _rep_vals(geo: _SortedGeo, vals_q):
    """Replicate a bin's value rows over the WX window positions of the
    folded lane layout (``[BIN, CPAD] -> [BIN, WX*CPAD]``)."""
    if rp.INTERPRET:
        return jnp.concatenate([vals_q] * geo.WX, axis=1)
    return pltpu.repeat(vals_q, geo.WX, axis=1)


def _box_x_slice(geo: _SortedGeo, tab_ref, r):
    """The box's x*channel lane slice of the padded accumulator: the
    whole extent for the full-x default, or the group's segment (dynamic
    128-aligned offset ``bx * CPAD``, static ``BXL`` width) when
    x-segmented."""
    if geo.nsx <= 1:
        return slice(None)
    bx = tab_ref[r, 5 + 3 * GBINS]
    return pl.ds(pl.multiple_of(bx * geo.CPAD, 128), geo.BXL)


def _build_fw_kernel(geo: _SortedGeo):
    BZ, BY = geo.BZ, geo.BY
    WZ, WY, WX = geo.WZ, geo.WY, geo.WX
    CPAD = geo.CPAD
    L = WX * CPAD

    def kernel(tab_ref, fzT_ref, fyT_ref, fxT_ref, vals_ref,
               _grid_in, grid_out, scratch, sem):
        g = pl.program_id(0)
        r = g % 8
        bz = tab_ref[r, 0]
        by = tab_ref[r, 1]

        @pl.when(tab_ref[r, 2] == 1)
        def _():
            # read-modify-write: neighbouring supercells overlap at the
            # +1 z/y halo planes (and the +OCT x halo when segmented),
            # and earlier cells' halo spill must be kept.  Supercells run
            # in sorted order on one core, so this is race-free.
            cp = pltpu.make_async_copy(
                grid_out.at[
                    pl.ds(bz, BZ),
                    pl.ds(pl.multiple_of(by, 8), BY),
                    _box_x_slice(geo, tab_ref, r),
                ],
                scratch, sem,
            )
            cp.start()
            cp.wait()

        # whole-group skip: slab-padding and beyond-capacity groups (the
        # trailing majority once zero-stencil samples are dropped) pay
        # only this scalar branch
        @pl.when(tab_ref[r, 4] == 1)
        def _():
            zy_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, WZ * WY), 1
            )
            xl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            for q in range(GBINS):
                fz = fzT_ref[:, q:q + 1]
                fy = fyT_ref[:, q:q + 1]
                fx = fxT_ref[:, q:q + 1]
                dz = tab_ref[r, 5 + q]
                dy = tab_ref[r, 5 + GBINS + q]
                dx = tab_ref[r, 5 + 2 * GBINS + q]
                st_zy, hx = _zy_hx(
                    geo, fz, fy, fx, bz, by, dz, dy, dx, zy_iota, xl_iota
                )
                # vals rows carry the splat values in lanes [0, CPAD)
                # (zero beyond C1; the plan's merged value+geometry rows
                # are sliced statically here)
                vx = hx * _rep_vals(
                    geo, vals_ref[q * BIN:(q + 1) * BIN, 0:CPAD]
                )
                upd = jax.lax.dot_general(
                    st_zy, vx, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # [WZ*WY, L]
                scratch[
                    pl.ds(dz, WZ), pl.ds(pl.multiple_of(dy, 8), WY),
                    pl.ds(pl.multiple_of(dx * CPAD, 128), L),
                ] += upd.reshape(WZ, WY, L)

        @pl.when(tab_ref[r, 3] == 1)
        def _():
            cp = pltpu.make_async_copy(
                scratch,
                grid_out.at[
                    pl.ds(bz, BZ),
                    pl.ds(pl.multiple_of(by, 8), BY),
                    _box_x_slice(geo, tab_ref, r),
                ],
                sem,
            )
            cp.start()
            cp.wait()

    return kernel


def _build_bw_kernel(geo: _SortedGeo):
    BZ, BY = geo.BZ, geo.BY
    WZ, WY, WX = geo.WZ, geo.WY, geo.WX
    CPAD = geo.CPAD
    L = WX * CPAD

    def kernel(tab_ref, fzT_ref, fyT_ref, fxT_ref, ggrid_hbm,
               out_ref, scratch, sem):
        g = pl.program_id(0)
        r = g % 8
        bz = tab_ref[r, 0]
        by = tab_ref[r, 1]

        @pl.when(tab_ref[r, 2] == 1)
        def _():
            cp = pltpu.make_async_copy(
                ggrid_hbm.at[
                    pl.ds(bz, BZ),
                    pl.ds(pl.multiple_of(by, 8), BY),
                    _box_x_slice(geo, tab_ref, r),
                ],
                scratch, sem,
            )
            cp.start()
            cp.wait()

        # skipped groups' rows are never gathered (live samples only
        # map into used groups; dead samples map to the appended zero
        # row), so their output block may stay unwritten
        @pl.when(tab_ref[r, 4] == 1)
        def _():
            zy_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, WZ * WY), 1
            )
            xl_iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
            for q in range(GBINS):
                fz = fzT_ref[:, q:q + 1]
                fy = fyT_ref[:, q:q + 1]
                fx = fxT_ref[:, q:q + 1]
                dz = tab_ref[r, 5 + q]
                dy = tab_ref[r, 5 + GBINS + q]
                dx = tab_ref[r, 5 + 2 * GBINS + q]
                st_zy, hx = _zy_hx(
                    geo, fz, fy, fx, bz, by, dz, dy, dx, zy_iota, xl_iota
                )
                win = scratch[
                    pl.ds(dz, WZ), pl.ds(pl.multiple_of(dy, 8), WY),
                    pl.ds(pl.multiple_of(dx * CPAD, 128), L),
                ].reshape(WZ * WY, L)
                # factored adjoint: gather the z/y-contracted window rows
                # per sample, weight by the expanded x hat, and fold the
                # WX periods of the x*channel lanes back to CPAD channels.
                # The first fold halves at L/2 — a 128-aligned slice
                # boundary whenever WX*CPAD/2 is a tile multiple — so
                # only the remaining WX/2 - 1 adds pay unaligned-slice
                # relayouts.
                tmp = hx * jnp.dot(
                    st_zy, win, preferred_element_type=jnp.float32
                )                                       # [BIN, L]
                half = L // 2
                if WX % 2 == 0 and half % 128 == 0:
                    tmp = tmp[:, 0:half] + tmp[:, half:L]
                    nx = WX // 2
                else:
                    nx = WX
                gq = tmp[:, 0:CPAD]
                for xc in range(1, nx):
                    gq = gq + tmp[:, xc * CPAD:(xc + 1) * CPAD]
                out_ref[q * BIN:(q + 1) * BIN, 0:CPAD] = gq

    return kernel


def feat_augmented(splatting_feature, valid_mask):
    """No-MLP splat values + the fused unit weight channel ``[R, C1]``
    (fed to :func:`sorted_plan` as ``feat_aug`` for the merged
    value+geometry slot gather)."""
    return jnp.concatenate(
        [
            splatting_feature * valid_mask[:, None],
            valid_mask[:, None].astype(splatting_feature.dtype),
        ],
        axis=1,
    ).astype(jnp.float32)


def sorted_vals_sample(geo: _SortedGeo, plan, fused, valid_mask):
    """Padded per-slot value rows from PER-SAMPLE fused vectors.

    The MLP splatter's value differs per (ray, step) — ``fused [R*S, C]``,
    already masked by ``valid_mask`` (the mask lives inside the fused
    computation so the custom VJP's cotangent flows through it).  The
    weight channel splats ``valid`` per sample; dead samples never get a
    slot (``sample_pad`` carries the ``N`` sentinel -> the appended zero
    row), so OOB masking needs no second application here.
    """
    N = fused.shape[0]
    R = valid_mask.shape[0]
    S = N // R
    v = jnp.broadcast_to(valid_mask[:, None], (R, S)).reshape(N, 1)
    feat_aug = jnp.concatenate(
        [fused.astype(jnp.float32), v.astype(jnp.float32)], axis=1
    )                                                          # [N, C1]
    # channel pad to a full lane tile (aligned rows gather faster and
    # the blocked kernel input stays tile-shaped; lanes [0, CPAD) hold
    # the values) + one trailing zero row for the pad-slot sentinel
    cpv = -(-geo.CPAD // 128) * 128
    feat_pad = jnp.pad(feat_aug, ((0, 1), (0, cpv - geo.C1)))
    return jnp.take(feat_pad, plan["sample_pad"], axis=0)      # [Npad, cpv]


def sorted_splat_acc(cfg, geo, plan, vals, acc):
    """One chunk's sorted splat, read-modify-writing the folded padded
    HBM accumulator ``acc [PZ, PY, PXp*CPAD]`` (aliased input->output).

    Threading the accumulator through chunk calls keeps one grid-sized
    buffer live for the whole ray set — the round-1 per-chunk zero grids +
    [V, C] adds were the main OOM driver at the reference's 160^3 x 64ch
    splatter benchmark config (16 GB v5e)."""
    BZ, BY = geo.BZ, geo.BY
    n_groups_cap = plan["fzT"].shape[0] // BIN
    vw = vals.shape[1]          # CPAD, or the fused value+geom row width

    kernel = _build_fw_kernel(geo)
    smem = pl.BlockSpec((8, 128), lambda g: (g // 8, 0),
                        memory_space=pltpu.SMEM)
    coordT_spec = pl.BlockSpec((BIN, GBINS), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)
    padded = pl.pallas_call(
        kernel,
        grid=(n_groups_cap,),
        in_specs=[
            smem, coordT_spec, coordT_spec, coordT_spec,
            pl.BlockSpec((GBINS * BIN, vw), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=_sds(
            (geo.PZ, geo.PY, geo.LX), jnp.float32,
            acc, vals, plan["fzT"],
        ),
        scratch_shapes=[
            pltpu.VMEM((BZ, BY, geo.BXL), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=rp._COMPILER_PARAMS,
        interpret=rp.INTERPRET,
    )(plan["table"], plan["fzT"], plan["fyT"], plan["fxT"], vals, acc)
    return padded


def crop_acc(geo: _SortedGeo, acc):
    """Slice the folded padded kernel-frame accumulator
    ``[PZ, PY, PXp*CPAD]`` into flat grid-frame ``(feat [V, C],
    w [V, 1])`` (un-permuting plane axes, dropping batch halo planes)."""
    CPAD = geo.CPAD
    acc = acc.reshape(geo.PZ, geo.PY, geo.PXp, CPAD)
    if geo.B > 1:
        core = acc[: geo.B * geo.zstride].reshape(
            geo.B, geo.zstride, geo.PY, geo.PXp, CPAD
        )[:, : geo.Dz, : geo.Hk, : geo.Wk, :]
    else:
        core = acc[None, : geo.Dz, : geo.Hk, : geo.Wk, :]
    # kernel frame [B, Dz, Hk, Wk] -> grid frame [B, gD, gH, gW]: a plane's
    # singleton axis moved to kernel-z with the active axes kept in grid
    # order, so the inverse is a pure reshape
    core = core.reshape(geo.B, geo.gD, geo.gH, geo.gW, CPAD)
    V = geo.B * geo.gD * geo.gH * geo.gW
    flat = core.reshape(V, CPAD)
    return flat[:, : geo.C], flat[:, geo.C: geo.C1]


def pad_grad_grid(geo: _SortedGeo, g_feat_grid):
    """Pad the flat grid-frame incoming gradient ``[V, C]`` to the
    kernel's folded ``[PZ, PY, PXp*CPAD]`` box layout (done once per
    backward, shared by every ray chunk)."""
    CPAD = geo.CPAD
    gg = g_feat_grid.reshape(geo.B, geo.gD, geo.gH, geo.gW, geo.C)
    gg = jnp.pad(gg, ((0, 0),) * 4 + ((0, CPAD - geo.C),))
    # grid frame -> kernel frame (pure reshape; see crop_acc)
    gg = gg.reshape(geo.B, geo.Dz, geo.Hk, geo.Wk, CPAD)
    if geo.B > 1:
        gg = jnp.pad(
            gg, ((0, 0), (0, 1), (0, geo.PY - geo.Hk),
                 (0, geo.PXp - geo.Wk), (0, 0)),
        ).reshape(geo.B * geo.zstride, geo.PY, geo.PXp, CPAD)
        gg = jnp.pad(gg, ((0, geo.PZ - geo.B * geo.zstride), (0, 0),
                          (0, 0), (0, 0)))
        return gg.reshape(geo.PZ, geo.PY, geo.LX)
    gg = jnp.pad(
        gg[0],
        ((0, geo.PZ - geo.Dz), (0, geo.PY - geo.Hk),
         (0, geo.PXp - geo.Wk), (0, 0)),
    )
    return gg.reshape(geo.PZ, geo.PY, geo.LX)


def sorted_splat_bwd(cfg, geo, plan, R, gg, per_sample: bool = False):
    """Adjoint gather: per-sample grads from the folded padded gradient
    grid ``gg [PZ, PY, PXp*CPAD]`` (see :func:`pad_grad_grid`), un-sorted
    and summed over march steps -> ``g_encoding [R, C]``.

    With ``per_sample=True`` the un-sorted ``[R*S, C]`` stream is returned
    before the ray sum — the MLP splatter's backward uses it as the
    cotangent of the per-sample fused vectors (reference
    ``templates/splatter_bw.py:183-394`` semantics)."""
    S = cfg.tot_num_samples
    BZ, BY = geo.BZ, geo.BY
    CPAD = geo.CPAD
    # stream rows padded to a full lane tile (Mosaic blocked-output lane
    # rule); lanes beyond CPAD are never written and sliced away below
    CPADP = -(-CPAD // 128) * 128
    n_groups_cap = plan["fzT"].shape[0] // BIN
    Npad = n_groups_cap * GBINS * BIN

    kernel = _build_bw_kernel(geo)
    smem = pl.BlockSpec((8, 128), lambda g: (g // 8, 0),
                        memory_space=pltpu.SMEM)
    coordT_spec = pl.BlockSpec((BIN, GBINS), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)
    g_stream = pl.pallas_call(
        kernel,
        grid=(n_groups_cap,),
        in_specs=[
            smem, coordT_spec, coordT_spec, coordT_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((GBINS * BIN, CPADP), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((Npad, CPADP), jnp.float32, gg, plan["fzT"]),
        scratch_shapes=[
            pltpu.VMEM((BZ, BY, geo.BXL), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=rp._COMPILER_PARAMS,
        interpret=rp.INTERPRET,
    )(plan["table"], plan["fzT"], plan["fyT"], plan["fxT"], gg)

    # dead samples carry slot == Npad -> the appended zero row
    g_stream = jnp.concatenate(
        [g_stream, jnp.zeros((1, CPADP), g_stream.dtype)], axis=0
    )
    g_sample = jnp.take(g_stream, plan["pos_orig"], axis=0)    # [N, CPADP]
    if per_sample:
        return g_sample[:, : geo.C]                            # [R*S, C]
    # lanes [CPAD, CPADP) of skipped-group blocks are uninitialized; they
    # are summed here but sliced away before any consumer sees them
    return g_sample.reshape(R, S, CPADP).sum(axis=1)[:, : geo.C]


# ---------------------------------------------------------------------------
# Folded-accumulator <-> grid-frame relayout kernels (round 5)
#
# ``crop_acc`` / ``pad_grad_grid`` as XLA reshapes retile the whole
# folded accumulator ([PZ, PY, PXp*CPAD] lane tiles -> [..., PXp, CPAD]
# with CPAD % 128 != 0): measured ~22 ms / ~40 ms per call at the 160^3 x
# 64ch bench shape on v5e — a view-count-INDEPENDENT fixed cost that
# dominates small splat batches (1 view = 0.56x the A100 anchor before
# round 5).  These kernels stream the relayout through VMEM instead: one
# program per (z, 8-y block) rearranges lanes at VPU speed and writes the
# grid-frame rows directly.
# ---------------------------------------------------------------------------


def _unfold_ok(geo: _SortedGeo) -> bool:
    """Kernel applicability: single batch element (no halo planes) and a
    sublane-tileable y extent; others keep the XLA reshape path."""
    return (geo.B == 1 and geo.Hk % 8 == 0 and geo.Wk >= 1
            and geo.CPAD % 128 == 0)


def crop_acc_fast(geo: _SortedGeo, acc):
    """:func:`crop_acc` via a streaming Pallas relayout when supported."""
    if not _unfold_ok(geo):
        return crop_acc(geo, acc)
    CPAD, Wk, Hk, Dz = geo.CPAD, geo.Wk, geo.Hk, geo.Dz
    nyb = Hk // 8
    rows = 8 * Wk
    V = Dz * Hk * Wk

    def kernel(acc_ref, feat_ref, w_ref):
        v = acc_ref[0]                          # [8, PXp*CPAD]
        v = v[:, : Wk * CPAD].reshape(8 * Wk, CPAD)
        feat_ref[...] = v[:, : geo.C]
        w_ref[...] = v[:, geo.C: geo.C1]

    feat, w = pl.pallas_call(
        kernel,
        grid=(Dz * nyb,),
        in_specs=[
            pl.BlockSpec((1, 8, geo.LX), lambda b: (b // nyb, b % nyb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, geo.C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((V, geo.C), jnp.float32, acc),
            _sds((V, 1), jnp.float32, acc),
        ],
        compiler_params=rp._COMPILER_PARAMS_FW,
        interpret=rp.INTERPRET,
    )(acc)
    return feat, w


def pad_grad_grid_fast(geo: _SortedGeo, g_feat_grid):
    """:func:`pad_grad_grid` via a streaming Pallas relayout when
    supported (zero halo rows/lanes written in-kernel)."""
    if not _unfold_ok(geo):
        return pad_grad_grid(geo, g_feat_grid)
    CPAD, Wk, Hk, Dz = geo.CPAD, geo.Wk, geo.Hk, geo.Dz
    nyb_out = geo.PY // 8
    nyb_in = Hk // 8
    rows = 8 * Wk

    def kernel(gg_ref, out_ref):
        b = pl.program_id(0)
        z = b // nyb_out
        yb = b % nyb_out
        live = jnp.logical_and(z < Dz, yb < nyb_in)
        v = jnp.where(live, gg_ref[...], 0.0)   # [8*Wk, C]
        v = jnp.pad(v, ((0, 0), (0, CPAD - geo.C)))
        v = v.reshape(8, Wk * CPAD)
        v = jnp.pad(v, ((0, 0), (0, (geo.PXp - Wk) * CPAD)))
        out_ref[...] = v[None]

    def in_map(b):
        z = b // nyb_out
        yb = b % nyb_out
        live = jnp.logical_and(z < Dz, yb < nyb_in)
        flat = jnp.where(live, z * nyb_in + yb, 0)
        return (flat, 0)

    return pl.pallas_call(
        kernel,
        grid=(geo.PZ * nyb_out,),
        in_specs=[
            pl.BlockSpec((rows, geo.C), in_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, geo.LX), lambda b: (b // nyb_out, b % nyb_out, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=_sds((geo.PZ, geo.PY, geo.LX), jnp.float32,
                       g_feat_grid),
        compiler_params=rp._COMPILER_PARAMS_FW,
        interpret=rp.INTERPRET,
    )(g_feat_grid)
