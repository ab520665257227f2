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
