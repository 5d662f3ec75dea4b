"""Windowed SSIM as a depthwise convolution.

Equivalent math to reference utils/loss_utils.py:23-63 (11x11 gaussian
window, sigma=1.5, C1=0.01^2, C2=0.03^2, same-padding) expressed with
lax.conv_general_dilated so XLA lowers it onto the MXU. Differentiable;
used both as a training loss term (1-SSIM) and an eval metric.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
         for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return g


def _depthwise_filter(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise gaussian blur with same padding. img: [C, H, W].

    The 11x11 gaussian window is an outer product, so the filter runs as
    two 1D passes (11+11 taps instead of 121): TPU depthwise convs run on
    the VPU, making tap count the direct cost — this is most of a full
    training step's SSIM time.
    """
    c = img.shape[0]
    k = window.shape[0]
    out = img[None]  # [1, C, H, W]
    col = jnp.broadcast_to(window[None, None, :, None], (c, 1, k, 1))
    row = jnp.broadcast_to(window[None, None, None, :], (c, 1, 1, k))
    for rhs, pad in ((col, [(k // 2, k // 2), (0, 0)]),
                     (row, [(0, 0), (k // 2, k // 2)])):
        out = jax.lax.conv_general_dilated(
            out, rhs,
            window_strides=(1, 1),
            padding=pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,  # TPU conv defaults to bf16
        )
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an image pair. Inputs [C, H, W] (or [N, C, H, W])."""
    if img1.ndim == 4:
        return jax.vmap(lambda a, b: ssim(a, b, window_size, sigma))(img1, img2).mean()
    window = jnp.asarray(_gaussian_window(window_size, sigma))

    mu1 = _depthwise_filter(img1, window)
    mu2 = _depthwise_filter(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = _depthwise_filter(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, window) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()
