"""Parity: sorted splatter vs naive oracle, random ray order + contraction."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lightplane_tpu.ops.rays import Rays
from lightplane_tpu.ops.splatter import _run_splatter

rng = np.random.default_rng(0)


def make_rays(R, n_grids=1, encoding_dim=8):
    origins = rng.normal(size=(R, 3)).astype(np.float32) / 3.0
    targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.3
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(
        directions=jnp.asarray(d),
        origins=jnp.asarray(origins),
        grid_idx=jnp.zeros((R,), jnp.int32),
        near=jnp.full((R,), 0.1, jnp.float32),
        far=jnp.full((R,), 3.0, jnp.float32),
        encoding=jnp.asarray(rng.normal(size=(R, encoding_dim)).astype(np.float32)),
    )


def run_case(R, gs, ns, ni, moob, contract):
    rays = make_rays(R, encoding_dim=gs[4])
    kw = dict(
        num_samples=ns, num_samples_inf=ni,
        mask_out_of_bounds_samples=moob, contract_coords=contract,
    )

    def f(enc, impl):
        r2 = Rays(rays.directions, rays.origins, rays.grid_idx,
                  rays.near, rays.far, enc)
        out = _run_splatter(
            r2, [gs], None, None, kw["num_samples"], kw["num_samples_inf"],
            kw["mask_out_of_bounds_samples"], kw["contract_coords"],
            1e-5, None, return_list=False, impl=impl,
        )
        return out

    proj = jnp.asarray(rng.normal(size=(int(np.prod(gs[1:4])), gs[4])).astype(np.float32))

    def loss(enc, proj, impl):
        return jnp.sum(f(enc, impl) * proj)

    o_ref = jax.jit(lambda e: f(e, "naive"))(rays.encoding)
    o_srt = jax.jit(lambda e: f(e, "sorted"))(rays.encoding)
    g_ref = jax.jit(jax.grad(lambda e, p: loss(e, p, "naive")))(rays.encoding, proj)
    g_srt = jax.jit(jax.grad(lambda e, p: loss(e, p, "sorted")))(rays.encoding, proj)

    def cmp(a, b, name):
        # scale-aware bars: on-chip matmuls round operands to bf16 (see
        # PARITY.md "On-chip numerics"), so absolute error tracks the
        # output scale; reference bars assume O(1) outputs.
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        mx = np.abs(a - b).max()
        mn = np.abs(a - b).mean()
        scale = max(np.abs(a).mean(), 1e-6)
        print(f"  {name}: max|d|={mx:.3e} mean|d|={mn:.3e} rel={mn/scale:.3e}")
        assert mx <= 0.1 * max(1.0, scale) and mn / scale <= 2e-3, (name, mx, mn)

    print(f"R={R} gs={gs} ns={ns} ni={ni} moob={moob} contract={contract}")
    cmp(o_ref, o_srt, "fwd")
    cmp(g_ref, g_srt, "grad_enc")


if __name__ == "__main__":
    run_case(257, (1, 48, 40, 56, 8), 33, 0, True, False)
    run_case(1024, (1, 64, 64, 64, 16), 48, 8, False, False)
    run_case(512, (1, 100, 90, 70, 4), 40, 0, True, True)
    run_case(300, (1, 160, 160, 160, 32), 96, 0, True, False)
    print("ALL OK")
