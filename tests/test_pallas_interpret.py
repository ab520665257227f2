"""Pallas kernel logic vs the scan implementation, in interpreter mode.

Runs the fused kernels through the Pallas interpreter on CPU so the kernel
math (stencil-matmul sampling, EA adjoint, MLP chain) is covered by the
regular test suite; the on-TPU compile path is exercised separately on
hardware.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightplane_tpu as lt
from lightplane_tpu.ops.kernels import renderer_pallas as rp
from .utils import compare_one, random_decoder_params, random_grid, random_rays


@pytest.fixture(autouse=True)
def _interpret_mode():
    rp.INTERPRET = True
    yield
    rp.INTERPRET = False


CASES = {
    "triplane": dict(),
    "voxel_batch": dict(grid_type="voxel", batch=2),
    "masked_inf_noise": dict(mask=True, ni=2, noise=0.2),
    "relu_field": dict(separate=True, trunk=0),
    # voxel + triplane mix in one grid-list (summed sampling) — the
    # reference's "grid-list decomposition" headline (feature_grids.md)
    "mixed_voxel_triplane": dict(grid_type="mixed"),
}


@pytest.mark.parametrize("case", list(CASES.keys()))
def test_pallas_matches_scan(case):
    cfg = dict(grid_type="triplane", batch=1, separate=False, noise=0.0,
               mask=False, ni=0, trunk=2)
    cfg.update(CASES[case])
    # small ray count; kernel pads internally to RAY_BLOCK
    n_rays = 40
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dp = random_decoder_params(
        k3, input_chn=8, hidden_chn=8, n_layers_trunk=cfg["trunk"],
        use_separate_color_grid=cfg["separate"],
    )
    rays = random_rays(k1, n_rays, cfg["batch"],
                       encoding_dim=dp.n_hidden_color[0])
    grid = random_grid(k2, cfg["batch"], 8, 5, cfg["grid_type"], scale=0.5)
    cgrid = (
        random_grid(k4, cfg["batch"], 8, 5, cfg["grid_type"], scale=0.5)
        if cfg["separate"] else None
    )
    kw = dict(
        num_samples=5, gain=1.3, num_samples_inf=cfg["ni"],
        mask_out_of_bounds_samples=cfg["mask"],
        inject_noise_sigma=cfg["noise"],
        inject_noise_seed=3 if cfg["noise"] > 0 else None,
        disparity_at_inf=1e-3, color_grid=cgrid,
    )

    def loss(impl, g0, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        g = [g0] + list(grid[1:])
        out = lt.lightplane_renderer(r, g, d, impl=impl, **kw)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params, rays.encoding)
    (l_s, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)

    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"{case}/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp", "g_enc"], g_s, g_p):
        compare_one(a, b, f"{case}/grad_{nm}")


def test_pallas_windowed_sampling_coherent_rays():
    """Coherent raster-order rays engage the dynamic-window fast path of
    the Pallas sampler (kernels/renderer_pallas.py _GridSampler); parity
    vs the scan implementation must hold on that path too."""
    assert rp.WINDOWED_SAMPLING
    side = 16
    n = side * side
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    chn = 16
    dp = random_decoder_params(k1, input_chn=chn, hidden_chn=8)
    # an image-tile ray bundle marching straight through a 32^2 triplane:
    # each chunk of steps spans a narrow y/z band -> window fits
    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.3, 0.3, side), jnp.linspace(-0.3, 0.3, side),
        indexing="ij",
    )
    rays = lt.Rays(
        directions=jnp.stack(
            [xs.ravel(), ys.ravel(), jnp.ones(n)], axis=-1
        ),
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.0),
        far=jnp.full((n,), 3.0),
        encoding=jax.random.normal(key, (n, dp.n_hidden_color[0])) * 0.1,
    )
    grid = random_grid(k2, 1, chn, 32, "triplane", scale=0.5)

    def loss(impl, g0, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            r, [g0] + list(grid[1:]), d, num_samples=16, gain=1.3,
            impl=impl,
        )
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params, rays.encoding)
    (_, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (_, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"win/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp", "g_enc"], g_s, g_p):
        compare_one(a, b, f"win/grad_{nm}")


def test_pallas_w2_packed_windows(monkeypatch):
    """The packed 2D-window path (tile-ordered rays, 32-cell windows,
    P=4 samples per 128-lane row) vs the scan implementation — and the
    runtime fit check must actually select it (not a silent fallback)."""
    H, W = 16, 64
    n = H * W
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dp = lt.init_decoder_params(
        k1, n_layers_opacity=2, n_layers_trunk=2, n_layers_color=2,
        input_chn=32, hidden_chn=32, color_chn=3, opacity_init_bias=-2.0)
    grid = [
        jax.random.normal(k2, (1, 1, 32, 32, 32)) * 0.1,
        jax.random.normal(k3, (1, 32, 1, 32, 32)) * 0.1,
        jax.random.normal(k4, (1, 32, 32, 1, 32)) * 0.1,
    ]
    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.05, 0.05, H), jnp.linspace(-0.1, 0.1, W),
        indexing="ij",
    )
    dirs = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], -1)
    # explicit full-size tiles: one 8x32 tile = one default 256-ray block
    # (the adaptive default_tile would pick smaller tiles at this size)
    order, _ = lt.tile_ray_order(H, W, tile=(8, 32))
    rays = lt.Rays(
        directions=dirs[order],
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.5),
        far=jnp.full((n,), 2.5),
        encoding=jax.random.normal(k5, (n, 32)) * 0.1,
    )
    fits_seen = {}
    orig_plan = rp._w2_plan

    def spy(*a, **kw):
        w0, fits = orig_plan(*a, **kw)
        fits_seen["fits"] = fits
        return w0, fits

    monkeypatch.setattr(rp, "_w2_plan", spy)

    def loss(impl, g0, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            r, [g0] + list(grid[1:]), d, num_samples=128, gain=1.0,
            impl=impl, mask_out_of_bounds_samples=True,
        )
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params, rays.encoding)
    (_, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (_, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    assert bool(fits_seen["fits"]), "W2 windows unexpectedly did not fit"
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"w2/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp", "g_enc"], g_s, g_p):
        compare_one(a, b, f"w2/grad_{nm}")


@pytest.mark.parametrize("use_mlp", [False, True])
def test_pallas_splatter_matches_scan(use_mlp):
    """Pallas splatter (fw + grads) vs the scan implementation, with a
    non-multiple-of-RAY_BLOCK ray count so the edge-replication padding
    path is exercised (padded rays must not splat: zero valid mask)."""
    from lightplane_tpu import (
        init_splatter_params, lightplane_mlp_splatter, lightplane_splatter,
    )

    n_rays = 37
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    chn = 16
    rays = random_rays(k1, n_rays, 1, encoding_dim=chn)
    out_size = [(1, 6, 6, 6, chn)]
    if use_mlp:
        sp = init_splatter_params(k2, n_layers=2, input_chn=chn,
                                  hidden_chn=16, out_chn=chn)
        igrid = random_grid(k3, 1, chn, 6, "voxel", scale=0.5)

        def run(impl, enc, mp, ig):
            r = dataclasses.replace(rays, encoding=enc)
            spp = dataclasses.replace(sp, mlp_params=mp)
            return lightplane_mlp_splatter(
                r, out_size, spp, [ig], num_samples=7, impl=impl,
                return_list=False)

        args = (rays.encoding, sp.mlp_params, igrid[0])
    else:
        def run(impl, enc):
            r = dataclasses.replace(rays, encoding=enc)
            return lightplane_splatter(
                r, out_size, num_samples=7, impl=impl, return_list=False)

        args = (rays.encoding,)

    n_args = len(args)
    (l_s, out_s), g_s = jax.value_and_grad(
        lambda *a: (jnp.sum(run("scan", *a) ** 2), run("scan", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda *a: (jnp.sum(run("pallas", *a) ** 2), run("pallas", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    compare_one(out_s, out_p, f"splat{use_mlp}/grid")
    for i, (a, b) in enumerate(zip(g_s, g_p)):
        compare_one(a, b, f"splat{use_mlp}/grad{i}")


@pytest.mark.parametrize("use_mlp", [False, True])
def test_sorted_splatter_matches_scan(use_mlp):
    """Sorted (octet-binned) splatter vs scan, fw + all grads, forced via
    impl='sorted' on a small non-cubic grid so the interpreter is fast.
    The MLP variant covers the fused input-grid sample + batched-MLP path
    (reference ``templates/splatter_fw.py:168-309``, ``splatter_bw.py:
    183-394``) end to end, including g_input_grid and g_mlp_params."""
    from lightplane_tpu import (
        init_splatter_params, lightplane_mlp_splatter, lightplane_splatter,
    )

    n_rays = 23
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    chn = 16
    rays = random_rays(k1, n_rays, 1, encoding_dim=chn)
    out_size = [(1, 20, 18, 24, chn)]
    if use_mlp:
        sp = init_splatter_params(k2, n_layers=2, input_chn=chn,
                                  hidden_chn=16, out_chn=chn)
        igrid = random_grid(k3, 1, chn, 6, "voxel", scale=0.5)

        def run(impl, enc, mp, ig):
            r = dataclasses.replace(rays, encoding=enc)
            spp = dataclasses.replace(sp, mlp_params=mp)
            return lightplane_mlp_splatter(
                r, out_size, spp, [ig], num_samples=9,
                mask_out_of_bounds_samples=True, impl=impl,
                return_list=False)

        args = (rays.encoding, sp.mlp_params, igrid[0])
    else:
        def run(impl, enc):
            r = dataclasses.replace(rays, encoding=enc)
            return lightplane_splatter(
                r, out_size, num_samples=9, impl=impl, return_list=False)

        args = (rays.encoding,)

    n_args = len(args)
    (l_s, out_s), g_s = jax.value_and_grad(
        lambda *a: (jnp.sum(run("scan", *a) ** 2), run("scan", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda *a: (jnp.sum(run("sorted", *a) ** 2), run("sorted", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    compare_one(out_s, out_p, f"sorted{use_mlp}/grid")
    for i, (a, b) in enumerate(zip(g_s, g_p)):
        compare_one(a, b, f"sorted{use_mlp}/grad{i}")


@pytest.mark.parametrize(
    "out_size",
    [
        # plane orientations (reference grid_sample_util.py:1088-1186)
        [(1, 1, 36, 44, 16)],
        [(1, 36, 1, 44, 16)],
        [(1, 36, 44, 1, 16)],
        # batched voxel
        [(3, 16, 20, 24, 16)],
        # multi-grid list: batched triplane + a batched voxel (grid-lists
        # share one batch size — grid_idx indexes the batch of EVERY grid)
        [(2, 1, 36, 44, 16), (2, 36, 1, 44, 16), (2, 36, 44, 1, 16),
         (2, 12, 12, 12, 16)],
    ],
    ids=["plane_xy", "plane_xz", "plane_yz", "batched", "multigrid"],
)
def test_sorted_splatter_shapes(out_size):
    """Round-3 sorted-kernel shape coverage: planes (all orientations),
    batched grids, and multi-grid lists splat fused (fw + g_encoding),
    vs the scan oracle.  Reference splats any grid-list via atomics
    (``templates/splatter_fw.py:71-309``)."""
    from lightplane_tpu import lightplane_splatter

    chn = 16
    n_b = max(gs[0] for gs in out_size)
    rays = random_rays(jax.random.PRNGKey(4), 33, n_b, encoding_dim=chn)

    def run(impl, enc):
        r = dataclasses.replace(rays, encoding=enc)
        return lightplane_splatter(
            r, out_size, num_samples=9, impl=impl, return_list=False)

    (l_s, out_s), g_s = jax.value_and_grad(
        lambda e: (jnp.sum(run("scan", e) ** 2), run("scan", e)),
        has_aux=True)(rays.encoding)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda e: (jnp.sum(run("sorted", e) ** 2), run("sorted", e)),
        has_aux=True)(rays.encoding)
    compare_one(out_s, out_p, "sorted_shapes/grid")
    compare_one(g_s, g_p, "sorted_shapes/g_enc")


@pytest.mark.parametrize("use_mlp", [False, True])
@pytest.mark.parametrize("save_plans", [True, False])
def test_sorted_splatter_chunked_plans(monkeypatch, save_plans, use_mlp):
    """Multi-chunk sorted path, with the fw sort plans saved as custom-VJP
    residuals (round 3: the backward then skips its per-chunk plan
    recompute — the dominant cost of the pass) and with the over-budget
    recompute fallback; both must match the scan oracle's gradients.
    ``_SORTED_CHUNK_SAMPLES`` is shrunk so the test config splits into
    3 ray chunks, exercising the scanned plan ys / plan xs threading."""
    from lightplane_tpu import (
        init_splatter_params, lightplane_mlp_splatter, lightplane_splatter,
    )
    from lightplane_tpu.ops import splatter as sp

    monkeypatch.setattr(sp, "_SORTED_CHUNK_SAMPLES", 128)
    if not save_plans:
        monkeypatch.setattr(sp, "_PLAN_RESID_BUDGET", 0)
    chn = 16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    rays = random_rays(k1, 37, 1, encoding_dim=chn)
    out_size = [(1, 20, 18, 24, chn)]
    if use_mlp:
        spp0 = init_splatter_params(k2, n_layers=2, input_chn=chn,
                                    hidden_chn=16, out_chn=chn)
        igrid = random_grid(k3, 1, chn, 6, "voxel", scale=0.5)

        def run(impl, enc, mp, ig):
            r = dataclasses.replace(rays, encoding=enc)
            s = dataclasses.replace(spp0, mlp_params=mp)
            return lightplane_mlp_splatter(
                r, out_size, s, [ig], num_samples=9, impl=impl,
                return_list=False)

        args = (rays.encoding, spp0.mlp_params, igrid[0])
    else:
        def run(impl, enc):
            r = dataclasses.replace(rays, encoding=enc)
            return lightplane_splatter(
                r, out_size, num_samples=9, impl=impl, return_list=False)

        args = (rays.encoding,)

    n_args = len(args)
    (_, out_s), g_s = jax.value_and_grad(
        lambda *a: (jnp.sum(run("scan", *a) ** 2), run("scan", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    (_, out_p), g_p = jax.value_and_grad(
        lambda *a: (jnp.sum(run("sorted", *a) ** 2), run("sorted", *a)),
        argnums=tuple(range(n_args)), has_aux=True)(*args)
    compare_one(out_s, out_p, f"chunked{save_plans}{use_mlp}/grid")
    for i, (a, b) in enumerate(zip(g_s, g_p)):
        compare_one(a, b, f"chunked{save_plans}{use_mlp}/grad{i}")


@pytest.mark.parametrize("coherent", [True, False])
def test_big_splatter_matches_scan(coherent):
    """Big-grid (HBM boxed-DMA) splatter vs scan: coherent camera rays
    engage the box path; random rays fall back through the XLA cond."""
    from lightplane_tpu import lightplane_splatter

    chn = 16
    res = 64  # >= MIN_CELLS_FOR_BIG
    if coherent:
        side = 24
        n = side * side
        ys, xs = jnp.meshgrid(
            jnp.linspace(-0.2, 0.2, side), jnp.linspace(-0.2, 0.2, side),
            indexing="ij",
        )
        rays = lt.Rays(
            directions=jnp.stack(
                [xs.ravel(), ys.ravel(), jnp.ones(n)], axis=-1
            ),
            origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
            grid_idx=jnp.zeros((n,), jnp.int32),
            near=jnp.full((n,), 1.2),
            far=jnp.full((n,), 2.8),
            encoding=jax.random.normal(jax.random.PRNGKey(0), (n, chn)),
        )
    else:
        rays = random_rays(jax.random.PRNGKey(0), 100, 1,
                           encoding_dim=chn)
    out_size = [(1, res, res, res, chn)]

    def run(impl, enc):
        r = dataclasses.replace(rays, encoding=enc)
        return lt.lightplane_splatter(
            r, out_size, num_samples=12, impl=impl, return_list=False)

    (l_s, out_s), g_s = jax.value_and_grad(
        lambda e: (jnp.sum(run("scan", e) ** 2), run("scan", e)),
        has_aux=True)(rays.encoding)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda e: (jnp.sum(run("big", e) ** 2), run("big", e)),
        has_aux=True)(rays.encoding)
    compare_one(out_s, out_p, f"big{coherent}/grid")
    compare_one(g_s, g_p, f"big{coherent}/g_enc")


@pytest.mark.parametrize("mode", ["random", "empty", "halfz"])
def test_pallas_scaffold_matches_scan(mode):
    """Scaffolded rendering through the Pallas kernels (per-(ray, step)
    occupancy gates precomputed outside; fw + grads vs scan).

    ``empty`` and ``halfz`` force whole march chunks to be fully gated,
    pinning the whole-chunk skip branch (``_scaffold_chunk_skip``): the
    skipped chunks' carries must pass through bit-exactly for parity
    with the scan to hold."""
    n_rays = 40
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dp = random_decoder_params(k3, input_chn=8, hidden_chn=8)
    rays = random_rays(k1, n_rays, 1, encoding_dim=dp.n_hidden_color[0])
    grid = random_grid(k2, 1, 8, 5, "triplane", scale=0.5)
    # a random binary occupancy scaffold
    scaffold = (
        jax.random.uniform(k4, (1, 6, 6, 6)) > 0.4
    ).astype(jnp.float32)
    if mode == "empty":
        scaffold = jnp.zeros_like(scaffold)
    elif mode == "halfz":
        scaffold = scaffold.at[:, 3:].set(0.0)

    def loss(impl, g0, mp):
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            rays, [g0] + list(grid[1:]), d, num_samples=9, gain=1.3,
            scaffold=scaffold, impl=impl,
        )
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params)
    (_, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1), has_aux=True)(*args)
    (_, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1), has_aux=True)(*args)
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"scaffold/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp"], g_s, g_p):
        compare_one(a, b, f"scaffold/grad_{nm}")
    # the scaffold must actually gate something (not vacuous)
    assert float(jnp.mean(scaffold)) < 1.0


def _w3_camera_rays(enc_dim, key, narrow=True):
    """An 8x16-pixel pinhole image whose single 128-ray block satisfies
    the W3 window budgets on a 32^3 grid (narrow fov, tight near/far)."""
    h, w = 8, 16
    n = h * w
    ys, xs = jnp.meshgrid(
        (jnp.arange(h) - (h - 1) / 2) / 80.0,
        (jnp.arange(w) - (w - 1) / 2) / 80.0,
        indexing="ij",
    )
    d = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], axis=-1)
    return lt.Rays(
        directions=d,
        origins=jnp.tile(jnp.array([[0.05, -0.1, -2.5]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.6),
        far=jnp.full((n,), 2.2),
        encoding=jax.random.normal(key, (n, enc_dim)) * 0.1,
    )


@pytest.mark.parametrize("case", ["coherent", "incoherent", "relu_field"])
def test_w3_big_voxel_matches_scan(case):
    """W3 boxed-DMA big-voxel renderer (kernels/renderer_w3.py) vs scan:
    a 32^3 grid exceeds MAX_CELLS_PER_GRID, so impl='pallas' runs the W3
    kernels when the window plan fits (coherent camera-tile rays) and the
    runtime cond falls back to scan otherwise (incoherent rays)."""
    from lightplane_tpu.ops.kernels import renderer_w3 as rw3

    res, chn = 32, 16
    assert res ** 3 > rp.MAX_CELLS_PER_GRID
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    separate = case == "relu_field"
    dp = random_decoder_params(
        k1, input_chn=chn, hidden_chn=16,
        n_layers_trunk=0 if separate else 2,
        use_separate_color_grid=separate,
    )
    if case == "incoherent":
        rays = random_rays(k2, 48, 1, encoding_dim=dp.n_hidden_color[0])
    else:
        rays = _w3_camera_rays(dp.n_hidden_color[0], k2)
    grid = random_grid(k3, 1, chn, res, "voxel", scale=0.5)
    cgrid = (
        random_grid(k4, 1, chn, res, "voxel", scale=0.5)
        if separate else None
    )
    kw = dict(num_samples=16, gain=1.2, color_grid=cgrid)

    def loss(impl, g0, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(r, [g0], d, impl=impl, **kw)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params, rays.encoding)
    (l_s, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"w3_{case}/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp", "g_enc"], g_s, g_p):
        compare_one(a, b, f"w3_{case}/grad_{nm}")


@pytest.mark.parametrize(
    "case", ["triplane", "batched", "contracted", "triplane100", "pyramid"]
)
def test_w3_big_shapes_match_scan(case):
    """Round-3 W3 shape coverage: fused rendering of big PLANES (the
    triplane 8192-cell cliff — reference samples any grid from global
    memory, grid_sample_util.py:1088-1186), BATCHED big voxels, and
    CONTRACTED big voxels (unbounded scenes, shared/ray_util.py:13-45 —
    the planner bounds the contracted sample points exactly per step).

    Round 4 kills the alignment cliffs: 'triplane100' exercises plane
    heights not 0 (mod 8) (flexible WY windows), and 'pyramid' a
    coarse-to-fine grid-list mixing a tiny 8^3 level (whole-axis
    windows) with a beyond-VMEM 24^3 level."""
    from lightplane_tpu.ops.kernels import renderer_w3 as rw3
    from lightplane_tpu.ops.renderer import _RenderCfg

    chn = 16
    key = jax.random.PRNGKey(9)
    k1, k2, k3 = jax.random.split(key, 3)
    dp = random_decoder_params(k1, input_chn=chn, hidden_chn=16,
                               n_layers_trunk=2)
    rays = _w3_camera_rays(dp.n_hidden_color[0], k2)
    if case == "triplane":
        res = 128  # 128^2 = 16384 cells/plane > MAX_CELLS_PER_GRID
        grid = random_grid(k3, 1, chn, res, "triplane", scale=0.5)
    elif case == "triplane100":
        res = 100  # 100^2 > MAX_CELLS_PER_GRID, height != 0 (mod 8)
        grid = random_grid(k3, 1, chn, res, "triplane", scale=0.5)
    elif case == "pyramid":
        grid = [
            jax.random.normal(k3, (1, 8, 8, 8, chn)) * 0.5,
            jax.random.normal(k3, (1, 24, 24, 24, chn)) * 0.5,
        ]
    elif case == "batched":
        grid = [jax.random.normal(k3, (2, 32, 32, 32, chn)) * 0.5]
        rays = dataclasses.replace(
            rays, grid_idx=jnp.ones_like(rays.grid_idx))
    else:
        grid = [jax.random.normal(k3, (1, 32, 32, 32, chn)) * 0.5]
    kw = dict(num_samples=16, gain=1.2,
              contract_coords=case == "contracted")
    sizes = tuple(tuple(int(s) for s in g.shape) for g in grid)
    cfg = _RenderCfg(
        num_samples=16, num_samples_inf=0, gain=1.2,
        mask_out_of_bounds_samples=False,
        contract_coords=case == "contracted",
        disparity_at_inf=1e-5, inject_noise_sigma=0.0,
        grid_sizes=sizes, color_grid_sizes=None,
        n_hidden_trunk=dp.n_hidden_trunk,
        n_hidden_opacity=dp.n_hidden_opacity,
        n_hidden_color=dp.n_hidden_color,
        use_scaffold=False, scaffold_size=None,
        num_rays_noise=rays.directions.shape[0],
    )
    assert rp._w3_mode(cfg) and rp.pallas_renderer_supported(cfg)

    def loss(impl, grids, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(r, list(grids), d, impl=impl, **kw)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (tuple(grid), dp.mlp_params, rays.encoding)
    (l_s, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (l_p, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"w3s_{case}/{nm}")
    for gi, (a, b) in enumerate(zip(g_s[0], g_p[0])):
        compare_one(a, b, f"w3s_{case}/grad_grid{gi}")
    for nm, a, b in zip(["g_mlp", "g_enc"], g_s[1:], g_p[1:]):
        compare_one(a, b, f"w3s_{case}/{nm}")


def test_pallas_w2_small_tile_shape(monkeypatch):
    """The 8x8-cell / P=2 packed-window shape (small-image tiles,
    tile_rays<=128): parity vs scan AND the runtime fit must select it
    (small tiles' frustum footprint exceeds the default 4-cell rows)."""
    H, W = 16, 32
    n = H * W
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dp = lt.init_decoder_params(
        k1, n_layers_opacity=2, n_layers_trunk=2, n_layers_color=2,
        input_chn=32, hidden_chn=32, color_chn=3, opacity_init_bias=-2.0)
    grid = [
        jax.random.normal(k2, (1, 1, 32, 32, 32)) * 0.1,
        jax.random.normal(k3, (1, 32, 1, 32, 32)) * 0.1,
        jax.random.normal(k4, (1, 32, 32, 1, 32)) * 0.1,
    ]
    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.125, 0.125, H), jnp.linspace(-0.25, 0.25, W),
        indexing="ij",
    )
    dirs = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(n)], -1)
    order, _ = lt.tile_ray_order(H, W, tile=(8, 8))
    rays = lt.Rays(
        directions=dirs[order],
        origins=jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 1.2),
        far=jnp.full((n,), 2.8),
        encoding=jax.random.normal(k5, (n, 32)) * 0.1,
    )
    # the shape choice must be (8, 8, 2) at tile_rays=64
    from lightplane_tpu.ops.renderer import _RenderCfg

    cfg = _RenderCfg(
        num_samples=64, num_samples_inf=0, gain=1.0,
        mask_out_of_bounds_samples=True, contract_coords=False,
        disparity_at_inf=1e-5, inject_noise_sigma=0.0,
        grid_sizes=tuple(tuple(int(x) for x in g.shape) for g in grid),
        color_grid_sizes=None,
        n_hidden_trunk=dp.n_hidden_trunk,
        n_hidden_opacity=dp.n_hidden_opacity,
        n_hidden_color=dp.n_hidden_color,
        use_scaffold=False, scaffold_size=None, num_rays_noise=n,
        ray_block_rays=64,
    )
    assert rp._w2_shape(cfg, rp._march_chunk(cfg)) == (8, 8, 2)
    assert rp._ray_block(cfg) == 64

    fits_seen = {}
    orig_plan = rp._w2_plan

    def spy(*a, **kw):
        w0, fits = orig_plan(*a, **kw)
        fits_seen["fits"] = fits
        return w0, fits

    monkeypatch.setattr(rp, "_w2_plan", spy)

    def loss(impl, g0, mp, enc):
        r = dataclasses.replace(rays, encoding=enc)
        d = dataclasses.replace(dp, mlp_params=mp)
        out = lt.lightplane_renderer(
            r, [g0] + list(grid[1:]), d, num_samples=64, gain=1.0,
            impl=impl, mask_out_of_bounds_samples=True, tile_rays=64,
        )
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(out)), out

    args = (grid[0], dp.mlp_params, rays.encoding)
    (_, out_s), g_s = jax.value_and_grad(
        lambda *a: loss("scan", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    (_, out_p), g_p = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2), has_aux=True
    )(*args)
    assert bool(fits_seen["fits"]), "small-tile W2 windows did not fit"
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"w2s/{nm}")
    for nm, a, b in zip(["g_grid", "g_mlp", "g_enc"], g_s, g_p):
        compare_one(a, b, f"w2s/grad_{nm}")


def test_w3_budget_autotune():
    """suggest_w3_budget picks the tightest candidate window budget whose
    plan fits the rig, and rendering with it (W3 kernels, interpret)
    matches the scan oracle.  Incoherent random rays fit no candidate ->
    None (the defaults + runtime fit fallback apply)."""
    from lightplane_tpu import suggest_w3_budget
    from lightplane_tpu.ops.renderer import W3_BUDGET_CANDIDATES

    res, chn = 32, 16
    assert res ** 3 > rp.MAX_CELLS_PER_GRID
    key = jax.random.PRNGKey(17)
    k1, k2, k3 = jax.random.split(key, 3)
    dp = random_decoder_params(k1, input_chn=chn, hidden_chn=16)
    rays = _w3_camera_rays(dp.n_hidden_color[0], k2)
    grid = random_grid(k3, 1, chn, res, "voxel", scale=0.5)
    kw = dict(num_samples=16, gain=1.2)

    budget = suggest_w3_budget(rays, grid, dp, num_samples=16)
    assert budget is not None
    # the 8x16-pixel narrow-fov rig fits a tighter-than-default budget
    defaults = (16, 24, 16)
    assert budget[0] * budget[1] * budget[2] <= (
        defaults[0] * defaults[1] * defaults[2]
    )
    assert budget in W3_BUDGET_CANDIDATES

    out_s = lt.lightplane_renderer(rays, grid, dp, impl="scan", **kw)
    out_p = lt.lightplane_renderer(
        rays, grid, dp, impl="pallas", w3_budget=budget, **kw
    )
    for nm, a, b in zip(["depth", "nlt", "feat"], out_s, out_p):
        compare_one(a, b, f"w3_budget/{nm}")

    # incoherent rays: no candidate fits
    rr = random_rays(k2, 48, 1, encoding_dim=dp.n_hidden_color[0])
    assert suggest_w3_budget(rr, grid, dp, num_samples=16) is None


def test_sorted_splatter_x_segmented(monkeypatch):
    """x-segmented supercells (round 5, ``LIGHTPLANE_SORTED_SUPX``): each
    z/y slab's full-x box splits into bounded x segments with a +OCT halo
    RMW'd by both neighbours.  Must reproduce the full-x results exactly
    (the default SUPX=0 path is covered by every other sorted test)."""
    from lightplane_tpu.ops.kernels import splatter_sorted as ss

    monkeypatch.setenv("LIGHTPLANE_SORTED_SUPX", "16")

    # the test grid (Wk=20 -> full_x=24) genuinely segments at SUPX=16
    class _Cfg:
        output_grid_sizes = ((1, 12, 16, 20, 4),)
        out_chn = 4

    geos = ss.sorted_geos(_Cfg)
    assert geos is not None and geos[0].nsx == 2, geos

    # reuse the non-MLP sorted parity body under the segmented env
    test_sorted_splatter_matches_scan(False)
