"""Sorted-splat plan verification (CPU, no Pallas).

The sorted big-grid splatter (``ops/kernels/splatter_sorted.py``) has two
phases: a pure-XLA planning phase (bucket samples into octets, sort, pad
to bins, build kernel tables) and a Pallas execution phase (stencil
matmuls against slab boxes).  The Pallas phase is validated in interpret
mode (``tests/test_pallas_interpret.py``) and on-chip
(``tests/test_tpu_parity.py``); this file checks the *planning* phase end
to end on CPU by reconstructing the splat in numpy exactly as the kernel
consumes the tables — same windows, same per-bin stencils, same slab
accumulation — and comparing against the naive oracle (reference
semantics: ``naive_splatter.py:185-289``).  Covers voxel grids, all three
plane orientations, and batched grids (round-3 shape generalization).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _SplatCfg, lightplane_splatter_raw
from lightplane_tpu.ops.kernels import splatter_sorted as ss


def _reconstruct_from_plan(geo, plan, feat_aug, S):
    """Numpy mimic of the fw kernel's table-driven accumulation."""
    fzT, fyT, fxT = plan["fzT"], plan["fyT"], plan["fxT"]
    table = plan["table"]
    R = feat_aug.shape[0]
    # per-slot ray id from the slot->sample map (sample N sentinel ->
    # row R, the appended zero pad row — mirrors sorted_plan's merged
    # value gather)
    sample_pad = np.asarray(plan["sample_pad"])
    ray_pad = np.minimum(sample_pad // S, R)
    feat_aug = np.concatenate(
        [feat_aug, np.zeros((1, feat_aug.shape[1]), feat_aug.dtype)]
    )
    ngc = fzT.shape[0] // ss.BIN
    WZ, WY, WX = geo.WZ, geo.WY, geo.WX
    grid = np.zeros((geo.PZ, geo.PY, geo.PXp, geo.C1), np.float32)
    for g in range(ngc):
        if table[g, 4] != 1:
            continue  # the kernels skip unused groups too
        bz, by = table[g, 0], table[g, 1]
        for q in range(ss.GBINS):
            dz = table[g, 5 + q]
            dy = table[g, 5 + ss.GBINS + q]
            dx = table[g, 5 + 2 * ss.GBINS + q]
            sl = slice(g * ss.BIN, (g + 1) * ss.BIN)
            fz, fy, fx = fzT[sl, q], fyT[sl, q], fxT[sl, q]
            rays_q = ray_pad[
                (g * ss.GBINS + q) * ss.BIN:(g * ss.GBINS + q + 1) * ss.BIN
            ]
            az0, ay0, ax0 = bz + dz, by + dy, dx
            zz = np.arange(WZ)[None, :, None, None] + az0
            yy = np.arange(WY)[None, None, :, None] + ay0
            xx = np.arange(WX)[None, None, None, :] + ax0
            hz = np.maximum(0, 1 - np.abs(zz - fz[:, None, None, None]))
            hy = np.maximum(0, 1 - np.abs(yy - fy[:, None, None, None]))
            hx = np.maximum(0, 1 - np.abs(xx - fx[:, None, None, None]))
            w = (hz * hy * hx).reshape(ss.BIN, -1)
            upd = w.T @ feat_aug[rays_q]
            grid[az0:az0 + WZ, ay0:ay0 + WY, ax0:ax0 + WX, :] += (
                upd.reshape(WZ, WY, WX, geo.C1)
            )
    return grid


def _crop_np(geo, grid):
    """Numpy mirror of ``splatter_sorted.crop_acc`` on a [PZ, PY, PXp,
    C1] reconstruction."""
    if geo.B > 1:
        core = grid[: geo.B * geo.zstride].reshape(
            geo.B, geo.zstride, geo.PY, geo.PXp, geo.C1
        )[:, : geo.Dz, : geo.Hk, : geo.Wk]
    else:
        core = grid[None, : geo.Dz, : geo.Hk, : geo.Wk]
    V = geo.B * geo.gD * geo.gH * geo.gW
    flat = core.reshape(V, geo.C1)
    return flat[:, : geo.C], flat[:, geo.C:]


@pytest.mark.parametrize(
    "R,gs,ns,moob,contract",
    [
        (16, (1, 48, 40, 56, 8), 33, True, False),
        (13, (1, 40, 36, 44, 4), 17, False, False),
        (16, (1, 48, 48, 48, 8), 25, True, True),
        # plane orientations (reference grid_sample_util.py:1088-1186)
        (16, (1, 1, 48, 56, 8), 21, False, False),
        (16, (1, 40, 1, 56, 8), 21, True, False),
        (16, (1, 40, 48, 1, 8), 21, False, False),
        # batched voxel + batched plane
        (18, (3, 24, 20, 28, 8), 15, False, False),
        (18, (2, 1, 48, 40, 4), 15, True, False),
    ],
)
def test_sorted_plan_reconstruction(R, gs, ns, moob, contract):
    rng = np.random.default_rng(0)
    origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
    targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    enc = rng.normal(size=(R, gs[4])).astype(np.float32)
    gidx = rng.integers(0, gs[0], size=(R,)).astype(np.int32)

    cfg = _SplatCfg(
        num_samples=ns, num_samples_inf=0,
        mask_out_of_bounds_samples=moob, contract_coords=contract,
        disparity_at_inf=1e-5, output_grid_sizes=(gs,),
        input_grid_sizes=None, n_hidden=(),
    )
    valid = jnp.ones((R,), jnp.float32)
    geom = (
        jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
        jnp.full((R,), 3.0), jnp.asarray(gidx), valid,
    )
    (geo,) = ss.sorted_geos(cfg)
    plan = jax.jit(lambda g: ss.sorted_plan(cfg, geo, g))(geom)
    plan = {k: np.asarray(v) for k, v in plan.items()}

    feat_aug = np.concatenate([enc, np.ones((R, 1), np.float32)], axis=1)
    grid = _reconstruct_from_plan(geo, plan, feat_aug, ns)
    # padding rows (z >= D etc.) must only hold the +1 halo of border cells,
    # which the kernel's crop discards; real-cell content lives in the core
    feat_np, w_np = _crop_np(geo, grid)

    rays = Rays(
        jnp.asarray(d), jnp.asarray(origins), jnp.asarray(gidx),
        jnp.full((R,), 0.1), jnp.full((R,), 3.0), jnp.asarray(enc),
    )
    f_ref, w_ref = jax.jit(
        lambda: lightplane_splatter_raw(
            rays, [gs], num_samples=ns,
            mask_out_of_bounds_samples=moob, contract_coords=contract,
            impl="naive",
        )
    )()
    np.testing.assert_allclose(feat_np, np.asarray(f_ref), atol=2e-4)
    np.testing.assert_allclose(w_np, np.asarray(w_ref), atol=2e-4)


def test_sorted_plan_slot_inverse():
    """``pos_orig`` must map every original sample to the padded slot that
    carries its coordinates (the bw un-sort depends on this bijection)."""
    R, ns, gs = 11, 19, (1, 40, 36, 44, 4)
    rng = np.random.default_rng(1)
    origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cfg = _SplatCfg(
        num_samples=ns, num_samples_inf=0,
        mask_out_of_bounds_samples=False, contract_coords=False,
        disparity_at_inf=1e-5, output_grid_sizes=(gs,),
        input_grid_sizes=None, n_hidden=(),
    )
    geom = (
        jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
        jnp.full((R,), 3.0), jnp.zeros((R,), jnp.int32),
        jnp.ones((R,), jnp.float32),
    )
    (geo,) = ss.sorted_geos(cfg)
    plan = jax.jit(lambda g: ss.sorted_plan(cfg, geo, g))(geom)
    pos = np.asarray(plan["pos_orig"])
    Npad = plan["sample_pad"].shape[0]
    live = pos < Npad  # zero-stencil (out-of-volume) samples map to Npad
    assert live.sum() > 0
    assert len(np.unique(pos[live])) == live.sum()  # injective on live
    sample_pad = np.asarray(plan["sample_pad"])
    ray_pad = np.minimum(sample_pad // ns, R)
    # the slot each live sample landed in must carry that sample's ray
    want = np.repeat(np.arange(R), ns)
    np.testing.assert_array_equal(ray_pad[pos[live]], want[live])
    # dropped samples must indeed be outside the grid's live window
    step = jnp.broadcast_to(jnp.arange(ns, dtype=jnp.int32)[None], (R, ns))
    pts = ss._march_points(
        cfg, geom[1][:, None, :], geom[0][:, None, :],
        geom[2][:, None], geom[3][:, None], step,
    )
    fz, fy, fx = ss._kernel_coords(geo, pts, geom[4][:, None])
    inside = np.asarray(
        (fz > -1) & (fz < geo.Dk) & (fy > -1) & (fy < geo.Hk)
        & (fx > -1) & (fx < geo.Wk)
    ).reshape(-1)
    np.testing.assert_array_equal(live, inside)


def test_sorted_recompute_coords_cover_windows():
    """The per-slot coordinate recompute must agree with the sort keys
    closely enough that every non-negligible hat weight lands inside the
    bin's assigned window (ADVICE r2: the key-pass/recompute agreement is
    load-bearing; pin it).

    The two passes share one elementwise expression
    (``_march_points``/``_kernel_coords``), but XLA may fuse them
    differently, so agreement is ~1 ulp rather than bitwise; a 1-ulp
    floor flip at an exact cell boundary can leave at most ~ulp of hat
    weight outside the window.  The invariant checked here: per slot,
    all hat weight above 1e-5 lies within the window."""
    R, ns, gs = 9, 13, (1, 40, 36, 44, 4)
    rng = np.random.default_rng(2)
    origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cfg = _SplatCfg(
        num_samples=ns, num_samples_inf=0,
        mask_out_of_bounds_samples=False, contract_coords=True,
        disparity_at_inf=1e-5, output_grid_sizes=(gs,),
        input_grid_sizes=None, n_hidden=(),
    )
    geom = (
        jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
        jnp.full((R,), 3.0), jnp.zeros((R,), jnp.int32),
        jnp.ones((R,), jnp.float32),
    )
    (geo,) = ss.sorted_geos(cfg)
    plan = jax.jit(lambda g: ss.sorted_plan(cfg, geo, g))(geom)
    plan = {k: np.asarray(v) for k, v in plan.items()}

    table = plan["table"]
    ngc = plan["fzT"].shape[0] // ss.BIN
    eps = 1e-5
    for g in range(ngc):
        if table[g, 4] != 1:
            continue
        bz, by = table[g, 0], table[g, 1]
        sl = slice(g * ss.BIN, (g + 1) * ss.BIN)
        for q in range(ss.GBINS):
            starts = (
                bz + table[g, 5 + q],
                by + table[g, 5 + ss.GBINS + q],
                table[g, 5 + 2 * ss.GBINS + q],
            )
            wins = (geo.WZ, geo.WY, geo.WX)
            sizes = (geo.Dk, geo.Hk, geo.Wk)
            coords = (plan["fzT"][sl, q], plan["fyT"][sl, q],
                      plan["fxT"][sl, q])
            for f, a0, w, S_ in zip(coords, starts, wins, sizes):
                live = f < 1e8  # skip pad-slot sentinels
                f = f[live]
                # cells holding more than eps of hat weight
                lo = np.ceil(f - 1 + eps)
                hi = np.floor(f + 1 - eps)
                # clip to the grid: outside cells are zeros-padding
                lo = np.maximum(lo, 0)
                hi = np.minimum(hi, S_ - 1)
                ok = (hi < lo) | ((lo >= a0) & (hi < a0 + w))
                assert ok.all(), (g, q, a0, w, f[~ok][:4])


@pytest.mark.parametrize("mode", ["0", "1"])
def test_sorted_cpad_modes_match_naive(mode):
    """Both accumulator lane modes — packed round16 CPAD and full
    128-lane cells (which engage the streaming crop/pad relayout
    kernels) — produce the naive oracle's splat, fw and bw (interpret
    mode)."""
    import lightplane_tpu as lt
    from lightplane_tpu.ops.kernels import renderer_pallas as rp

    old = ss._CPAD128_ENV
    old_interp = rp.INTERPRET
    ss._CPAD128_ENV = mode
    rp.INTERPRET = jax.default_backend() == "cpu"
    try:
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        R, S, res, chn = 64, 6, 12, 8
        rays = Rays(
            directions=jax.random.normal(k1, (R, 3)),
            origins=jax.random.normal(k2, (R, 3)) * 0.2,
            grid_idx=jnp.zeros((R,), jnp.int32),
            near=jnp.full((R,), 0.2),
            far=jnp.full((R,), 2.0),
            encoding=jax.random.normal(key, (R, chn)),
        )
        sizes = ((1, res, res, res, chn),)

        def run(fn):
            def loss(enc):
                r = dataclasses.replace(rays, encoding=enc)
                (g,) = fn(r, sizes, num_samples=S, return_list=True)
                return jnp.sum(g * jnp.cos(jnp.arange(g.size)
                                           .reshape(g.shape))), g
            (l, g), grad = jax.value_and_grad(loss, has_aux=True)(
                rays.encoding)
            return np.asarray(g), np.asarray(grad)

        g_n, gr_n = run(lambda *a, **k: lt.lightplane_splatter(
            *a, impl="naive", **k))
        g_s, gr_s = run(lambda *a, **k: lt.lightplane_splatter(
            *a, impl="sorted", **k))
        np.testing.assert_allclose(g_s, g_n, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(gr_s, gr_n, rtol=2e-5, atol=2e-5)
    finally:
        ss._CPAD128_ENV = old
        rp.INTERPRET = old_interp
