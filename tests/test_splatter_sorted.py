"""Sorted-splat plan verification (CPU, no Pallas).

The sorted big-grid splatter (``ops/kernels/splatter_sorted.py``) has two
phases: a pure-XLA planning phase (bucket samples into octets, sort, pad
to bins, build kernel tables) and a Pallas execution phase (stencil
matmuls against slab boxes).  The Pallas phase is validated on-chip
(``scratch/sorted_parity.py``, PARITY.md "On-chip numerics"); this test
checks the *planning* phase end-to-end on CPU by reconstructing the splat
in numpy exactly as the kernel consumes the tables — same windows, same
per-bin stencils, same slab accumulation — and comparing against the
naive oracle (reference semantics: ``naive_splatter.py:185-289``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _SplatCfg, lightplane_splatter_raw
from lightplane_tpu.ops.kernels import splatter_sorted as ss


def _reconstruct_from_plan(geo, plan, feat_aug):
    """Numpy mimic of the fw kernel's table-driven accumulation."""
    fzT, fyT, fxT = plan["fzT"], plan["fyT"], plan["fxT"]
    table, ray_pad = plan["table"], plan["ray_pad"]
    ngc = fzT.shape[0] // ss.BIN
    WZ, WY, WX = ss.WZ, ss.WY, ss.WX
    grid = np.zeros((geo.PZ, geo.PY, geo.PXp, geo.C1), np.float32)
    for g in range(ngc):
        bz, by = table[g, 0], table[g, 1]
        for q in range(ss.GBINS):
            dz = table[g, 4 + q]
            dy = table[g, 4 + ss.GBINS + q]
            dx = table[g, 4 + 2 * ss.GBINS + q]
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


@pytest.mark.parametrize(
    "R,gs,ns,moob,contract",
    [
        (16, (1, 48, 40, 56, 8), 33, True, False),
        (13, (1, 40, 36, 44, 4), 17, False, False),
        (16, (1, 48, 48, 48, 8), 25, True, True),
    ],
)
def test_sorted_plan_reconstruction(R, gs, ns, moob, contract):
    rng = np.random.default_rng(0)
    origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
    targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    enc = rng.normal(size=(R, gs[4])).astype(np.float32)

    cfg = _SplatCfg(
        num_samples=ns, num_samples_inf=0,
        mask_out_of_bounds_samples=moob, contract_coords=contract,
        disparity_at_inf=1e-5, output_grid_sizes=(gs,),
        input_grid_sizes=None, n_hidden=(),
    )
    valid = jnp.ones((R,), jnp.float32)
    geom = (
        jnp.asarray(d), jnp.asarray(origins), jnp.full((R,), 0.1),
        jnp.full((R,), 3.0), jnp.zeros((R,), jnp.int32), valid,
    )
    geo = ss.sorted_geo(cfg)
    plan = jax.jit(lambda g: ss.sorted_plan(cfg, g))(geom)
    plan = {k: np.asarray(v) for k, v in plan.items()}

    feat_aug = np.concatenate([enc, np.ones((R, 1), np.float32)], axis=1)
    grid = _reconstruct_from_plan(geo, plan, feat_aug)
    # padding rows (z >= D etc.) must only hold the +1 halo of border cells,
    # which the kernel's crop discards; real-cell content lives in the core
    core = grid[: geo.D, : geo.H, : geo.W]
    feat_np = core[..., : geo.C].reshape(-1, geo.C)
    w_np = core[..., geo.C:].reshape(-1, 1)

    rays = Rays(
        jnp.asarray(d), jnp.asarray(origins), jnp.zeros((R,), jnp.int32),
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
    plan = jax.jit(lambda g: ss.sorted_plan(cfg, g))(geom)
    pos = np.asarray(plan["pos_orig"])
    assert len(np.unique(pos)) == R * ns  # injective
    ray_pad = np.asarray(plan["ray_pad"])
    # the slot each sample landed in must carry that sample's ray index
    want = np.repeat(np.arange(R), ns)
    np.testing.assert_array_equal(ray_pad[pos], want)
