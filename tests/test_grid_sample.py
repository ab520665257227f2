"""Grid sampling/splatting numerics.

The sampler must match ``torch.nn.functional.grid_sample(...,
align_corners=False, padding_mode="zeros")`` — the convention the reference
oracle uses (``naive_renderer.py:674-731``) — and the splat must be its exact
transpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightplane_tpu.ops.grid_sample import (
    sample_grid_rep,
    splat_grid_rep,
)
from lightplane_tpu.ops.misc_utils import flatten_grid


def _torch_sample_voxel(g, pts, mode="bilinear"):
    """g: [B, D, H, W, C]; pts: [B, N, 3] (x, y, z) in [-1, 1]."""
    gt = torch.from_numpy(np.asarray(g)).permute(0, 4, 1, 2, 3)
    pt = torch.from_numpy(np.asarray(pts))[:, :, None, None, :]
    out = torch.nn.functional.grid_sample(
        gt, pt, align_corners=False, mode=mode
    )  # [B, C, N, 1, 1]
    return out[..., 0, 0].permute(0, 2, 1).numpy()


def _torch_sample_plane(g, pts2, mode="bilinear"):
    """g: [B, H, W, C]; pts2: [B, N, 2] (x, y)."""
    gt = torch.from_numpy(np.asarray(g)).permute(0, 3, 1, 2)
    pt = torch.from_numpy(np.asarray(pts2))[:, :, None, :]
    out = torch.nn.functional.grid_sample(
        gt, pt, align_corners=False, mode=mode
    )
    return out[..., 0].permute(0, 2, 1).numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_voxel_sample_matches_torch(seed):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    B, D, H, W, C = 2, 5, 6, 7, 4
    g = jax.random.normal(k1, (B, D, H, W, C))
    # points both inside and slightly outside the cube
    pts = jax.random.uniform(k2, (B, 50, 3), minval=-1.3, maxval=1.3)

    g_flat, sizes = flatten_grid([g])
    ours = np.stack(
        [
            np.asarray(
                sample_grid_rep(
                    g_flat, sizes, pts[b][None], jnp.array([b]), False
                )
            )[0]
            for b in range(B)
        ]
    )
    ref = _torch_sample_voxel(g, pts)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("singular_dim,coords", [(0, (0, 1)), (1, (0, 2)),
                                                 (2, (1, 2))])
def test_plane_sample_matches_torch(singular_dim, coords):
    # planes: D singleton -> xy plane; H singleton -> xz; W singleton -> yz
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    B, S, C = 2, 6, 4
    shape = [B, S, S, S, C]
    shape[singular_dim + 1] = 1
    g = jax.random.normal(k1, tuple(shape))
    pts = jax.random.uniform(k2, (B, 40, 3), minval=-1.2, maxval=1.2)

    g_flat, sizes = flatten_grid([g])
    ours = np.stack(
        [
            np.asarray(
                sample_grid_rep(
                    g_flat, sizes, pts[b][None], jnp.array([b]), False
                )
            )[0]
            for b in range(B)
        ]
    )
    g2d = jnp.squeeze(g, axis=singular_dim + 1)
    ref = _torch_sample_plane(g2d, pts[..., list(coords)])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_sample_matches_torch():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    B, D, H, W = 1, 4, 5, 6
    g = jax.random.normal(k1, (B, D, H, W, 1))
    pts = jax.random.uniform(k2, (B, 200, 3), minval=-0.99, maxval=0.99)
    g_flat, sizes = flatten_grid([g])
    ours = np.asarray(
        sample_grid_rep(g_flat, sizes, pts, jnp.array([0]), False,
                        mode="nearest")
    )
    ref = _torch_sample_voxel(g, pts, mode="nearest")
    # round-half ties can differ; compare where not on a .5 boundary
    match = np.isclose(ours, ref, atol=1e-5)
    assert match.mean() > 0.98


def test_mask_out_of_bounds():
    g = jnp.ones((1, 4, 4, 4, 2))
    g_flat, sizes = flatten_grid([g])
    pts = jnp.array([[[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]]])
    out = sample_grid_rep(g_flat, sizes, pts, jnp.array([0]), True)
    assert np.asarray(out)[0, 0, 0] == pytest.approx(1.0)
    assert np.asarray(out)[0, 1, 0] == 0.0


def test_splat_is_transpose_of_sample():
    """<sample(g, p), f> == <g, splat(f, p)> for random g, f, p."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    B, D, H, W, C = 2, 4, 5, 3, 4
    sizes = ((B, D, H, W, C), (B, 1, H, W, C))
    v_total = B * D * H * W + B * H * W
    g_flat = jax.random.normal(k1, (v_total, C))
    pts = jax.random.uniform(k2, (7, 11, 3), minval=-1.2, maxval=1.2)
    feats = jax.random.normal(k3, (7, 11, C))
    gidx = jnp.array([0, 1, 0, 1, 0, 1, 0])

    sampled = sample_grid_rep(g_flat, sizes, pts, gidx, False)
    lhs = jnp.sum(sampled * feats)
    splatted = splat_grid_rep(feats, v_total, sizes, pts, gidx, False)
    rhs = jnp.sum(splatted * g_flat)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_splat_matches_torch_oracle_corner_case():
    """A single point at a known location splats the right corner weights."""
    sizes = ((1, 2, 2, 2, 1),)
    pts = jnp.array([[[0.0, 0.0, 0.0]]])  # center: all 8 corners weight 1/8
    feats = jnp.ones((1, 1, 1))
    out = splat_grid_rep(feats, 8, sizes, pts, jnp.array([0]), False)
    np.testing.assert_allclose(np.asarray(out).ravel(), np.full(8, 0.125),
                               atol=1e-6)
