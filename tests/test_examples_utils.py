"""Tests for example-layer utilities: NNFM style loss, CO3D loader, IO."""

import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightplane_tpu.utils.nnfm_loss import (
    NNFMLoss,
    cos_loss,
    gram_matrix,
    match_colors_for_image_set,
    nn_feat_replace,
    random_conv_features_fn,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_nn_feat_replace_identity():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8, 20))
    # matching against itself returns itself (each column is its own NN)
    out = nn_feat_replace(a, a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=1e-5)
    assert float(cos_loss(a, out)) < 1e-6


def test_gram_matrix():
    a = jnp.ones((4, 10))
    g = gram_matrix(a)
    np.testing.assert_allclose(np.asarray(g), 10.0 * np.ones((4, 4)))
    gc = gram_matrix(a, center=True)
    np.testing.assert_allclose(np.asarray(gc), np.zeros((4, 4)), atol=1e-6)


def test_match_colors():
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (2, 8, 8, 3)) * 0.5
    style = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 3))
    out, tf = match_colors_for_image_set(imgs, style)
    assert out.shape == imgs.shape
    assert tf.shape == (4, 4)
    # recolored statistics move toward the style's mean
    assert abs(
        float(out.mean()) - float(style.mean())
    ) < abs(float(imgs.mean()) - float(style.mean())) + 0.05


def test_nnfm_loss_runs_and_grads():
    loss_fn = NNFMLoss(features_fn=random_conv_features_fn(widths=(8, 16)))
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (3, 16, 16))
    style = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16))

    def total(img):
        d = loss_fn(img, style, blocks=[0, 1],
                    loss_names=["nnfm_loss", "gram_loss", "content_loss"],
                    contents=style)
        return d["nnfm_loss"] + 1e-8 * d["gram_loss"] + d["content_loss"]

    val, grad = jax.value_and_grad(total)(img)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    # style loss of the style image against itself is ~0 (nnfm + content)
    d_self = loss_fn(style, style, blocks=[0],
                     loss_names=["nnfm_loss", "content_loss"],
                     contents=style)
    assert float(d_self["nnfm_loss"]) < 1e-4
    assert float(d_self["content_loss"]) < 1e-10


def _write_fake_co3d(root, n_frames=6, hw=(12, 10), hw_list=None,
                     focal_list=None):
    """A miniature CO3D-format category with a single sequence.

    ``hw_list`` / ``focal_list`` give each frame its own image size /
    ndc focal length (cycled), for per-frame fidelity tests."""
    import imageio.v2 as imageio

    cat = os.path.join(root, "toycat")
    os.makedirs(os.path.join(cat, "images"), exist_ok=True)
    frames = []
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        H, W = hw_list[i % len(hw_list)] if hw_list else hw
        focal = focal_list[i % len(focal_list)] if focal_list else (2.0, 2.0)
        rel = f"toycat/images/frame{i:03d}.jpg"
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(root, rel), img)
        az = 2 * np.pi * i / n_frames
        # a simple world-to-camera rotation + unit-distance translation
        c, s = np.cos(az), np.sin(az)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T = np.array([0.0, 0.0, 2.0])
        frames.append({
            "frame_number": i,
            "sequence_name": "seq0",
            "image": {"size": [H, W], "path": rel},
            "viewpoint": {
                "R": R.tolist(),
                "T": T.tolist(),
                "focal_length": list(focal),
                "principal_point": [0.0, 0.0],
            },
        })
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
        json.dump(frames, f)


def test_co3d_loader(tmp_path):
    from utils.datasets import auto_dataset, load_co3d

    root = str(tmp_path)
    _write_fake_co3d(root)
    ds = load_co3d(root, split="train", hold_every=3)
    assert ds.n_images == 4  # 6 frames, every 3rd held out
    assert ds.height == 12 and ds.width == 10
    assert ds.origins.shape == (4 * 12 * 10, 3)
    assert np.all(np.isfinite(ds.origins))
    assert np.all(np.isfinite(ds.directions))
    assert ds.gt.min() >= 0.0 and ds.gt.max() <= 1.0
    # camera normalization: origins should be ~unit distance from center
    d = np.linalg.norm(ds.origins.reshape(4, -1, 3)[:, 0], axis=-1)
    assert np.all(d < 5.0) and np.all(d > 0.05)
    # auto-detect routes to co3d
    ds2 = auto_dataset(root, "auto", split="test", hold_every=3)
    assert ds2.n_images == 2


def test_co3d_per_frame_sizes_and_intrinsics(tmp_path):
    """Per-frame fidelity (reference ``co3d_dataset.py:30-270`` keeps each
    frame's own size): frames of DIFFERENT sizes and focal lengths must
    survive the pipeline — per-frame image shapes in ``frame_hw`` /
    ``image(i)``, and per-frame intrinsics in the ray geometry (checked
    rotation-invariantly: the angle between the two ends of a frame's
    first pixel row depends only on that frame's intrinsics)."""
    from utils.datasets import load_co3d

    root = str(tmp_path)
    hw_list = [(12, 10), (16, 8)]
    focal_list = [(2.0, 2.0), (3.0, 2.5)]
    _write_fake_co3d(root, n_frames=6, hw_list=hw_list,
                     focal_list=focal_list)
    ds = load_co3d(root, split="train", hold_every=3)  # keeps frames 1,2,4,5
    kept = [1, 2, 4, 5]
    assert ds.n_images == 4
    assert ds.frame_hw is not None
    for row, i in zip(ds.frame_hw, kept):
        assert tuple(int(x) for x in row) == hw_list[i % 2]
    # total ray count is the sum of per-frame pixel counts
    assert ds.origins.shape[0] == sum(
        h * w for (h, w) in (hw_list[i % 2] for i in kept)
    )
    for fi, i in enumerate(kept):
        o, d, gt = ds.image(fi)
        H, W = hw_list[i % 2]
        assert gt.shape == (H, W, 3)
        assert o.shape == d.shape == (H * W, 3)
        # expected intrinsics: ndc focal * half-size, principal at center
        fx, fy = focal_list[i % 2]
        fx_pix, cx = fx * W * 0.5, W * 0.5
        fy_pix, cy = fy * H * 0.5, H * 0.5
        dc_l = np.array([(0 - cx) / fx_pix, (0 - cy) / fy_pix, 1.0])
        dc_r = np.array([(W - 1 - cx) / fx_pix, (0 - cy) / fy_pix, 1.0])
        want = dc_l @ dc_r / (
            np.linalg.norm(dc_l) * np.linalg.norm(dc_r)
        )
        dl, dr = d[0], d[W - 1]
        got = dl @ dr / (np.linalg.norm(dl) * np.linalg.norm(dr))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_perceptual_loss():
    from lightplane_tpu.utils.metrics import perceptual_loss

    ffn = random_conv_features_fn(widths=(8, 16))
    a = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 3))
    # identical images -> zero distance; different -> positive
    assert float(perceptual_loss(a, a, ffn, blocks=(0, 1))) < 1e-6
    assert float(perceptual_loss(a, b, ffn, blocks=(0, 1))) > 1e-3
    # differentiable (the reference's LPIPS term trains through it)
    g = jax.grad(lambda x: perceptual_loss(x, b, ffn, blocks=(0, 1)))(a)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_fit_app_image_mode_smoke(tmp_path):
    """Whole-image training mode with the perceptual loss: two steps on the
    procedural scene (reference renderer_type='image' + LPIPS,
    fit_single_scene.py:256-315)."""
    import fit_single_scene as app

    app.main([
        "--dataset_type", "synthetic", "--n_iter", "2",
        "--ray_sampling", "image", "--perceptual_weight", "0.05",
        "--grid_resolution", "8", "--grid_channels", "16",
        "--num_samples", "8", "--eval_rate", "1000", "--impl", "scan",
        "--output_dir", str(tmp_path / "out"),
    ])


def test_write_video(tmp_path):
    from lightplane_tpu.utils.io_utils import write_video

    frames = [np.zeros((8, 8, 3), np.float32) + i / 4 for i in range(4)]
    out = write_video(str(tmp_path / "v.mp4"), frames, fps=4)
    assert os.path.exists(out)
