"""Tests for grid regularizers/upsampling, metrics, cameras, datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu.utils.grid_utils import (
    grid_l1_loss,
    grid_tv_loss,
    grid_up_sample,
    init_3d_representation,
)
from lightplane_tpu.utils.metrics import calc_psnr, calc_ssim
from lightplane_tpu.utils.cameras import (
    camera_rays,
    look_at_c2w,
    sphere_cameras,
)


def test_init_representation_shapes():
    key = jax.random.PRNGKey(0)
    vox = init_3d_representation(key, "voxel_grid", 8, 4)
    assert [g.shape for g in vox] == [(1, 8, 8, 8, 4)]
    tri = init_3d_representation(key, "triplane", 8, 4)
    assert [g.shape for g in tri] == [
        (1, 1, 8, 8, 4), (1, 8, 1, 8, 4), (1, 8, 8, 1, 4)
    ]


def test_tv_and_l1():
    const = [jnp.ones((1, 4, 4, 4, 2))]
    assert float(grid_tv_loss(const)) == 0.0
    assert float(grid_l1_loss(const)) == 1.0
    key = jax.random.PRNGKey(0)
    noisy = [jax.random.normal(key, (1, 4, 4, 4, 2))]
    assert float(grid_tv_loss(noisy)) > 0.0


def test_up_sample():
    key = jax.random.PRNGKey(0)
    tri = init_3d_representation(key, "triplane", 4, 2)
    up = grid_up_sample(tri, 2)
    assert [g.shape for g in up] == [
        (1, 1, 8, 8, 2), (1, 8, 1, 8, 2), (1, 8, 8, 1, 2)
    ]
    # upsampling a constant grid stays constant
    const = [jnp.full((1, 4, 4, 4, 2), 3.0)]
    up_c = grid_up_sample(const, 2)[0]
    np.testing.assert_allclose(np.asarray(up_c), 3.0, atol=1e-6)


def test_psnr_ssim():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (32, 32, 3))
    assert float(calc_psnr(img, img)) >= 99.0
    assert abs(float(calc_ssim(img, img)) - 1.0) < 1e-5
    noisy = jnp.clip(img + 0.1 * jax.random.normal(key, img.shape), 0, 1)
    assert float(calc_psnr(img, noisy)) < 30.0
    assert float(calc_ssim(img, noisy)) < 0.99


def test_ssim_bounded_on_flat_regions():
    # regression: fp-negative variances on constant windows used to push
    # SSIM above 1 (observed 1.175 in a real training eval)
    img = jnp.ones((64, 64, 3))
    img = img.at[20:40, 20:40].set(0.3)
    noisy = img + 1e-4 * jax.random.normal(jax.random.PRNGKey(0), img.shape)
    s = float(calc_ssim(noisy, img))
    assert 0.0 <= s <= 1.0
    assert float(calc_ssim(img, img)) == 1.0


def test_camera_rays_geometry():
    c2w = look_at_c2w(np.array([0, 0, 3.0]), np.zeros(3))
    o, d = camera_rays(c2w, 8, 8, focal=8.0, near=1.0, far=5.0)
    assert o.shape == (64, 3) and d.shape == (64, 3)
    # all origins at the eye
    np.testing.assert_allclose(
        o, np.broadcast_to(np.array([0, 0, 3.0]), o.shape), atol=1e-6
    )
    # central ray points toward origin (-z in world here)
    center = d.reshape(8, 8, 3)[4, 4]
    assert center[2] < 0

    cams = sphere_cameras(6, radius=2.0)
    assert cams.shape == (6, 4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(cams[:, :3, 3], axis=1), 2.0, atol=1e-5
    )


def test_synthetic_dataset():
    import sys, os
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "..", "examples"),
    )
    from utils.datasets import make_synthetic_scene

    ds = make_synthetic_scene(n_views=2, image_size=16)
    assert ds.origins.shape == (2 * 16 * 16, 3)
    assert ds.gt.min() >= 0.0 and ds.gt.max() <= 1.0 + 1e-5
    o, d, img = ds.image(1)
    assert img.shape == (16, 16, 3)


def test_profiling_helpers():
    from lightplane_tpu.utils.profiling import Memory, Timer

    x = jnp.ones((256, 256))
    with Timer("matmul") as t:
        y = x @ x
        t.fence = y
    assert t.ms is not None and t.ms >= 0.0
    with Memory("matmul") as m:
        z = (x @ x).block_until_ready()
    assert z is not None  # stats may be absent on some backends


def test_vgg16_jax_features_and_lpips_path(tmp_path):
    """The local-weights VGG16 JAX extractor: correct tap shapes, NPZ
    round-trip, differentiability through perceptual_loss, and the
    calc_lpips LIGHTPLANE_VGG_WEIGHTS resolution path."""
    import os

    import numpy as np

    from lightplane_tpu.utils.metrics import calc_lpips, perceptual_loss
    from lightplane_tpu.utils.nnfm_loss import (
        _VGG16_CFG, vgg16_jax_features_fn,
    )

    rng = np.random.default_rng(0)
    pairs = []
    c_in = 3
    npz = {}
    i = 0
    for widths in _VGG16_CFG:
        for w in widths:
            k = rng.normal(size=(w, c_in, 3, 3)).astype(np.float32) * 0.05
            b = np.zeros((w,), np.float32)
            pairs.append((k, b))
            npz[f"conv{i}_w"] = k
            npz[f"conv{i}_b"] = b
            c_in = w
            i += 1
    fn = vgg16_jax_features_fn(pairs)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    feats = fn(jnp.transpose(img, (2, 0, 1)), (0, 2, 4))
    assert [f.shape for f in feats] == [
        (64, 32, 32), (256, 8, 8), (512, 2, 2)
    ]

    # npz round-trip gives the same features
    path = tmp_path / "vgg.npz"
    np.savez(path, **npz)
    fn2 = vgg16_jax_features_fn(str(path))
    feats2 = fn2(jnp.transpose(img, (2, 0, 1)), (0, 2, 4))
    for a, b in zip(feats, feats2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # differentiable through perceptual_loss; zero at identity
    tgt = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    val, g = jax.value_and_grad(
        lambda p: perceptual_loss(p, tgt, features_fn=fn,
                                  blocks=(0, 1, 2))
    )(img)
    assert np.isfinite(float(val)) and float(val) > 0
    assert np.isfinite(np.asarray(g)).all()
    zero = perceptual_loss(tgt, tgt, features_fn=fn, blocks=(0, 1, 2))
    assert abs(float(zero)) < 1e-6

    # calc_lpips picks up the env-var checkpoint (lpips pkg absent here)
    old = os.environ.get("LIGHTPLANE_VGG_WEIGHTS")
    os.environ["LIGHTPLANE_VGG_WEIGHTS"] = str(path)
    try:
        d = calc_lpips(np.asarray(img), np.asarray(tgt))
        assert np.isfinite(d) and d > 0
    finally:
        if old is None:
            os.environ.pop("LIGHTPLANE_VGG_WEIGHTS", None)
        else:
            os.environ["LIGHTPLANE_VGG_WEIGHTS"] = old


def test_visualize_rays_plot_data():
    """Visualizer parity (reference visualize.py:102-288): one scene per
    grid index with near AND far endpoint markers, pixel colors attached
    to the NEAR points, and per-scene axis bounds fitted to the ray
    endpoints (merged with the NDC cube)."""
    from lightplane_tpu import Rays
    from lightplane_tpu.utils.visualize import rays_plot_data

    n = 8
    rays = Rays(
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1)),
        origins=jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1)),
        grid_idx=jnp.asarray([0] * 4 + [1] * 4, jnp.int32),
        near=jnp.full((n,), 0.5),
        far=jnp.full((n,), 5.0),
    )
    colors = np.linspace(0.0, 1.0, n * 3).reshape(n, 3)
    scenes = rays_plot_data(rays, pixel_colors=colors)
    assert [s["grid_idx"] for s in scenes] == [0, 1]
    for s in scenes:
        assert s["p_near"].shape == (4, 3) and s["p_far"].shape == (4, 3)
        np.testing.assert_allclose(s["p_near"][:, 2], -2.5)  # o + 0.5*d
        np.testing.assert_allclose(s["p_far"][:, 2], 2.0)    # o + 5.0*d
        # pixel colors at the NEAR points (reference visualize.py:212-233)
        assert len(s["near_colors"]) == 4
        assert all(c.startswith("rgb(") for c in s["near_colors"])
        # fitted bounds include the cube AND the endpoints
        lo, hi = s["axis_range"][:, 0], s["axis_range"][:, 1]
        assert (lo <= -1.0).all() and (hi >= 1.0).all()
        assert lo[2] <= -2.5 and hi[2] >= 2.0
    # without pixel colors the near markers are plain
    assert rays_plot_data(rays)[0]["near_colors"] is None


def test_visualize_rays_plotly_figure():
    """Full plotly figure (only when plotly is installed)."""
    pytest.importorskip("plotly")
    from lightplane_tpu import Rays
    from lightplane_tpu.utils.visualize import visualize_rays_plotly

    n = 4
    rays = Rays(
        directions=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1)),
        origins=jnp.tile(jnp.array([[0.0, 0.0, -3.0]]), (n, 1)),
        grid_idx=jnp.zeros((n,), jnp.int32),
        near=jnp.full((n,), 0.5),
        far=jnp.full((n,), 5.0),
    )
    fig = visualize_rays_plotly(rays)
    names = [t.name for t in fig.data]
    assert "near_0" in names and "far_0" in names and "rays_0" in names
    rng = fig.layout["scene"]["zaxis"]["range"]
    assert rng is not None and rng[1] >= 2.0
