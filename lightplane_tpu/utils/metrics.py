"""Image quality metrics: PSNR, SSIM (pure JAX), optional LPIPS.

Counterpart of reference ``examples/utils/util/metric.py:13-91``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def calc_psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio, images in [0, 1]."""
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def calc_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity for ``[H, W, C]`` images, Gaussian-windowed
    (standard Wang et al. formulation; reference ``metric.py:18-60``)."""
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    kern = _gaussian_kernel(filter_size, filter_sigma)

    def blur(img):
        # separable gaussian filter over H and W per channel
        img = jnp.moveaxis(img, -1, 0)  # [C, H, W]
        img = jax.vmap(
            lambda ch: jnp.apply_along_axis(
                lambda row: jnp.convolve(row, kern, mode="valid"), 1, ch
            )
        )(img)
        img = jax.vmap(
            lambda ch: jnp.apply_along_axis(
                lambda col: jnp.convolve(col, kern, mode="valid"), 0, ch
            )
        )(img)
        return jnp.moveaxis(img, 0, -1)

    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = blur(pred * pred)
    mu_tt = blur(target * target)
    mu_pt = blur(pred * target)
    # clamp the moment estimates: on near-constant windows (flat
    # backgrounds) fp cancellation yields slightly negative variances,
    # which can push the structure ratio (and SSIM) above 1
    var_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    var_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    cov = mu_pt - mu_p * mu_t
    cov_bound = jnp.sqrt(var_p * var_t)
    cov = jnp.clip(cov, -cov_bound, cov_bound)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


def calc_lpips(pred, target, net: str = "vgg"):
    """LPIPS perceptual distance.

    Resolution order: (1) the ``lpips`` pip package when installed (the
    reference's exact metric, ``examples/.../metric.py``); (2) a local
    pretrained VGG16 checkpoint pointed at by the
    ``LIGHTPLANE_VGG_WEIGHTS`` env var, run through the differentiable
    JAX extractor (:func:`~lightplane_tpu.utils.nnfm_loss.
    vgg16_jax_features_fn`) with LPIPS's unit-normalize-and-average
    structure; (3) raises ImportError with guidance.
    """
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError:
        import os

        path = os.environ.get("LIGHTPLANE_VGG_WEIGHTS")
        if path and os.path.exists(path):
            fn = _vgg_features_fn(path)
            return float(perceptual_loss(
                jnp.asarray(pred), jnp.asarray(target), features_fn=fn,
                blocks=(0, 1, 2, 3, 4),
            ))
        raise ImportError(
            "LPIPS requires the `lpips` pip package, or a local "
            "pretrained VGG16 checkpoint via LIGHTPLANE_VGG_WEIGHTS "
            "(neither available). Use calc_psnr/calc_ssim instead."
        ) from None
    import numpy as np

    loss_fn = lpips.LPIPS(net=net)
    to_t = lambda x: torch.from_numpy(
        np.asarray(x, dtype=np.float32)
    ).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(loss_fn(to_t(pred), to_t(target)))


@functools.lru_cache(maxsize=2)
def _vgg_features_fn(path):
    from .nnfm_loss import vgg16_jax_features_fn

    return vgg16_jax_features_fn(path)


@functools.lru_cache(maxsize=1)
def _default_features_fn():
    """The default feature extractor, built once: a local pretrained
    VGG16 checkpoint (``LIGHTPLANE_VGG_WEIGHTS``) when available — true
    LPIPS-style features — else the hermetic fixed-seed random conv
    pyramid."""
    import os

    path = os.environ.get("LIGHTPLANE_VGG_WEIGHTS")
    if path and os.path.exists(path):
        return _vgg_features_fn(path)
    from .nnfm_loss import random_conv_features_fn

    return random_conv_features_fn()


def perceptual_loss(pred_hwc, target_hwc, features_fn=None,
                    blocks=(0, 1, 2)):
    """Differentiable LPIPS-structured perceptual distance, pure JAX.

    Same computation shape as LPIPS (Zhang et al. 2018, used by the
    reference fit app's whole-image mode,
    ``examples/fit_single_scene.py:256-315``): extract multi-scale conv
    feature maps of both images, channel-normalize each map to unit
    length per pixel, and average the squared differences per block.
    The feature extractor is pluggable (``features_fn(img_chw, blocks)
    -> [per-block [C, H, W] maps]``); the default is the hermetic
    fixed-seed random conv pyramid
    (:func:`lightplane_tpu.utils.nnfm_loss.random_conv_features_fn`) —
    random multi-scale conv features carry the multi-scale/translation
    structure that makes perceptual losses work, without downloading
    pretrained weights.  Pass a VGG-backed ``features_fn`` for exact
    LPIPS-style features where torchvision is available (note that one
    is not JAX-differentiable; training needs a JAX extractor).
    """
    from .nnfm_loss import _normalize_chn

    if not blocks:
        raise ValueError("perceptual_loss needs at least one block")
    if features_fn is None:
        features_fn = _default_features_fn()
    a = jnp.transpose(pred_hwc, (2, 0, 1))
    b = jnp.transpose(target_hwc, (2, 0, 1))
    fa = features_fn(a, blocks)
    fb = features_fn(b, blocks)
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = _normalize_chn(xa.reshape(xa.shape[0], -1))
        nb = _normalize_chn(xb.reshape(xb.shape[0], -1))
        total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=0))
    return total / len(fa)
