"""Multi-device (8 virtual CPU devices) data-parallel parity tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu import (
    lightplane_renderer,
    lightplane_splatter,
)
from lightplane_tpu.parallel import (
    data_parallel_renderer,
    data_parallel_splatter,
    make_mesh,
    shard_rays,
)
from .utils import (
    compare_one,
    random_decoder_params,
    random_grid,
    random_rays,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    return make_mesh()


def test_dp_renderer_matches_single(mesh):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dp = random_decoder_params(k3, input_chn=8, hidden_chn=8)
    rays = random_rays(k1, 64, 2, encoding_dim=dp.n_hidden_color[0])
    grid = random_grid(k2, 2, 8, 5, "voxel", scale=0.5)

    ref = lightplane_renderer(rays, grid, dp, num_samples=6, gain=1.0)
    render = data_parallel_renderer(mesh)
    out = render(shard_rays(rays, mesh), grid, dp, num_samples=6, gain=1.0)
    for name, a, b in zip(["depth", "nlt", "feat"], ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_dp_renderer_grad_psum(mesh):
    """Grid/MLP grads from the sharded path must equal single-device grads
    (shard_map AD inserts the psum across the ray shards)."""
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    dp = random_decoder_params(k3, input_chn=8, hidden_chn=8)
    rays = random_rays(k1, 32, 1, encoding_dim=dp.n_hidden_color[0])
    grid = random_grid(k2, 1, 8, 4, "voxel", scale=0.5)
    render = data_parallel_renderer(mesh)

    def loss_single(g, p):
        out = lightplane_renderer(
            rays, [g], dataclasses.replace(dp, mlp_params=p),
            num_samples=5, gain=1.0,
        )
        return sum(jnp.sum(o) for o in out)

    def loss_dp(g, p):
        out = render(
            rays, [g], dataclasses.replace(dp, mlp_params=p),
            num_samples=5, gain=1.0,
        )
        return sum(jnp.sum(o) for o in out)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(grid[0], dp.mlp_params)
    g_dp = jax.grad(loss_dp, argnums=(0, 1))(grid[0], dp.mlp_params)
    compare_one(g_ref[0], g_dp[0], "grad_grid", max_diff=1e-4,
                mean_diff=1e-5)
    compare_one(g_ref[1], g_dp[1], "grad_mlp", max_diff=1e-4, mean_diff=1e-5)


def test_dp_splatter_matches_single(mesh):
    key = jax.random.PRNGKey(2)
    k1 = jax.random.split(key, 1)[0]
    rays = random_rays(k1, 64, 2, encoding_dim=16)
    sizes = [(2, 4, 4, 4, 16)]
    ref = lightplane_splatter(
        rays, sizes, num_samples=6, return_list=False
    )
    splat = data_parallel_splatter(mesh)
    out = splat(rays, sizes, num_samples=6, return_list=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_dp_splatter_grad_psum(mesh):
    """The sharded splatter's encoding gradient must equal the
    single-device gradient: the raw (feature, weight) accumulators psum
    BEFORE normalization, so the quotient — and its VJP through the
    numerator only — is bitwise the single-device computation."""
    key = jax.random.PRNGKey(3)
    k1 = jax.random.split(key, 1)[0]
    rays = random_rays(k1, 64, 2, encoding_dim=16)
    sizes = [(2, 4, 4, 4, 16)]
    splat = data_parallel_splatter(mesh)

    def loss_single(enc):
        r = dataclasses.replace(rays, encoding=enc)
        out = lightplane_splatter(r, sizes, num_samples=6,
                                  return_list=False)
        return jnp.sum(out ** 2)

    def loss_dp(enc):
        r = dataclasses.replace(rays, encoding=enc)
        return jnp.sum(
            splat(r, sizes, num_samples=6, return_list=False) ** 2
        )

    g_ref = jax.grad(loss_single)(rays.encoding)
    g_dp = jax.grad(loss_dp)(rays.encoding)
    compare_one(g_ref, g_dp, "grad_enc", max_diff=1e-4, mean_diff=1e-5)


def test_dp_mlp_splatter_grad(mesh):
    """use_mlp=True data-parallel splatter: forward parity AND gradients
    for the encoding (sharded), the MLP params and the input grid (both
    replicated -> psum'd cotangents) vs single-device."""
    from lightplane_tpu import lightplane_mlp_splatter
    from .utils import random_splatter_params

    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    chn = 16
    rays = random_rays(k1, 64, 1, encoding_dim=chn)
    sp = random_splatter_params(k2, input_chn=chn, hidden_chn=16,
                                out_chn=chn)
    igrid = random_grid(k3, 1, chn, 5, "voxel", scale=0.5)
    sizes = [(1, 4, 4, 4, chn)]
    splat = data_parallel_splatter(mesh, use_mlp=True)

    def loss_single(enc, mp, ig):
        r = dataclasses.replace(rays, encoding=enc)
        spp = dataclasses.replace(sp, mlp_params=mp)
        out = lightplane_mlp_splatter(
            r, sizes, spp, [ig], num_samples=6, return_list=False)
        return jnp.sum(out ** 2), out

    def loss_dp(enc, mp, ig):
        r = dataclasses.replace(rays, encoding=enc)
        out = splat(r, sizes, mlp_params=sp, input_grid=[ig],
                    num_samples=6, return_list=False)
        # the replicated mlp flat vector enters through splat's args; to
        # differentiate w.r.t. mp we rebuild the callable's params here
        return jnp.sum(out ** 2), out

    # fw parity
    (_, out_ref) = loss_single(rays.encoding, sp.mlp_params, igrid[0])
    (_, out_dp) = loss_dp(rays.encoding, sp.mlp_params, igrid[0])
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_dp), atol=1e-5)

    # grads: differentiate through the dp path w.r.t. all three inputs
    def loss_dp_full(enc, mp, ig):
        r = dataclasses.replace(rays, encoding=enc)
        spp = dataclasses.replace(sp, mlp_params=mp)
        out = splat(r, sizes, mlp_params=spp, input_grid=[ig],
                    num_samples=6, return_list=False)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(
        lambda *a: loss_single(*a)[0], argnums=(0, 1, 2)
    )(rays.encoding, sp.mlp_params, igrid[0])
    g_dp = jax.grad(loss_dp_full, argnums=(0, 1, 2))(
        rays.encoding, sp.mlp_params, igrid[0])
    for nm, a, b in zip(["enc", "mlp", "igrid"], g_ref, g_dp):
        compare_one(a, b, f"mlp_splat_grad_{nm}", max_diff=1e-4,
                    mean_diff=1e-5)


def test_dp_sorted_splatter_big_grid(mesh):
    """Data-parallel splatting into a BEYOND-VMEM output grid: the sorted
    octet-binned path (chunk-scanned Pallas kernels over a threaded padded
    HBM accumulator) must compose with shard_map — each shard runs its own
    sort/plan over its ray slice, and the raw padded accumulators psum
    before normalization.  Runs the kernels in interpret mode on the 8-way
    CPU mesh (VERDICT r3: the sorted path had never run under shard_map)."""
    from lightplane_tpu.ops.kernels import renderer_pallas as rp

    rp.INTERPRET = True
    try:
        key = jax.random.PRNGKey(5)
        k1 = jax.random.split(key, 1)[0]
        rays = random_rays(k1, 32, 1, encoding_dim=4)
        sizes = [(1, 24, 24, 24, 4)]   # 13,824 cells > MAX_CELLS_PER_GRID
        assert 24 ** 3 > rp.MAX_CELLS_PER_GRID
        # check_vma resolves automatically: True (checker ON) everywhere
        # except Pallas INTERPRET mode, where jax 0.9.0's HLO interpreter
        # cannot evaluate any kernel under the vma checker (see the
        # test_pallas_interpret_check_vma_upstream_bug canary below).
        splat = data_parallel_splatter(mesh)

        def loss_single(enc):
            r = dataclasses.replace(rays, encoding=enc)
            out = lightplane_splatter(r, sizes, num_samples=6,
                                      return_list=False, impl="sorted")
            return jnp.sum(out ** 2), out

        def loss_dp(enc):
            r = dataclasses.replace(rays, encoding=enc)
            out = splat(r, sizes, num_samples=6, return_list=False,
                        impl="sorted")
            return jnp.sum(out ** 2), out

        (_, out_ref), g_ref = jax.value_and_grad(
            loss_single, has_aux=True)(rays.encoding)
        (_, out_dp), g_dp = jax.value_and_grad(
            loss_dp, has_aux=True)(rays.encoding)
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_dp), atol=1e-5)
        compare_one(g_ref, g_dp, "sorted_dp_grad_enc", max_diff=1e-4,
                    mean_diff=1e-5)
    finally:
        rp.INTERPRET = False


def test_pallas_interpret_check_vma_upstream_bug(mesh):
    """CANARY for the upstream jax bug that forces check_vma off in
    interpret mode (jax 0.9.0): the Pallas HLO interpreter evaluates the
    kernel jaxpr with ``jax_core.eval_jaxpr`` without inserting ``pvary``,
    so under ``shard_map(check_vma=True)`` even a trivial elementwise
    kernel fails with "Primitive mul requires varying manual axes to
    match".  ``data_parallel_splatter`` therefore auto-resolves
    ``check_vma`` to False ONLY in interpret mode (sharding.py).

    When a jax upgrade fixes the interpreter, this test FAILS — that is
    the signal to delete the auto-resolution and run the checker
    unconditionally."""
    from jax.experimental import pallas as pl
    from jax.sharding import PartitionSpec as P

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        return pl.pallas_call(
            kernel,
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (32, 128), jnp.float32, vma=frozenset({"rays"})
            ),
            interpret=True,
        )(x)

    g = jax.shard_map(f, mesh=mesh, in_specs=P("rays"),
                      out_specs=P("rays"), check_vma=True)
    x = jnp.ones((256, 128))
    try:
        g(x)
    except ValueError as e:
        assert "varying manual axes" in str(e), e
        return
    pytest.fail(
        "jax's Pallas interpreter now supports check_vma=True — remove the "
        "interpret-mode auto-resolution in parallel/sharding.py and run the "
        "vma checker unconditionally."
    )
