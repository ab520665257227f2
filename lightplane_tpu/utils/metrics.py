"""Image quality metrics: PSNR, SSIM (pure JAX), optional LPIPS.

Counterpart of reference ``examples/utils/util/metric.py:13-91``.
"""

from __future__ import annotations

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
    """LPIPS perceptual distance (requires the optional ``lpips`` package;
    raises ImportError with guidance otherwise)."""
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError as e:
        raise ImportError(
            "LPIPS requires the `lpips` pip package (not installed in this"
            " environment). Use calc_psnr/calc_ssim instead."
        ) from e
    import numpy as np

    loss_fn = lpips.LPIPS(net=net)
    to_t = lambda x: torch.from_numpy(
        np.asarray(x, dtype=np.float32)
    ).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(loss_fn(to_t(pred), to_t(target)))
