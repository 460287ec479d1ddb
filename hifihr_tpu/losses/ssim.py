"""SSIM with an 11x11 gaussian window, as a grouped depthwise convolution.

Numerically equivalent to the reference's pytorch_ssim
(utils/pytorch_ssim/__init__.py:17-37); used both as a training loss and as
the texture eval metric.  NHWC layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int = 11, sigma: float = 1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _filter(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 11x11 conv with SAME padding; img (B, H, W, C)."""
    c = img.shape[-1]
    k = jnp.asarray(window)[:, :, None, None]  # (K, K, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))  # feature_group_count = C
    return jax.lax.conv_general_dilated(
        img,
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over batch/pixels/channels. Images (B, H, W, C) in [0, 1]."""
    w = _gaussian_window(window_size)
    mu1 = _filter(img1, w)
    mu2 = _filter(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter(img2 * img2, w) - mu2_sq
    sigma12 = _filter(img1 * img2, w) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
