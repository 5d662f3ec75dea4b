"""Windowed SSIM as banded MXU matmuls.

Equivalent math to reference utils/loss_utils.py:23-63 (11x11 gaussian
window, sigma=1.5, C1=0.01^2, C2=0.03^2, same-padding). The separable
gaussian blur runs as two dot_generals against precomputed banded
matrices: depthwise 1D convs lower onto the TPU VPU with heavy layout
shuffling (~0.22 ms per pass, ~20 passes through fwd+bwd of a training
step), while the banded matmuls ride the MXU at a fraction of that.
Differentiable; used both as a training loss term (1-SSIM) and an eval
metric.
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


@functools.lru_cache(maxsize=32)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix B with B[i, j] = w[i - j + half] inside the
    band: x @ B == same-padded 1D correlation of each row of x with w
    (zero padding at the borders, exactly like the reference conv2d)."""
    w = _gaussian_window(window_size, sigma)
    half = window_size // 2
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    d = i - j + half
    inside = (d >= 0) & (d < window_size)
    return np.where(inside, w[np.clip(d, 0, window_size - 1)], 0.0).astype(
        np.float32)


def _depthwise_filter(img: jnp.ndarray, window_size: int,
                      sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of [C, H, W] -> [C, W, H] (note the swap).

    Two banded matmuls; each dot_general appends the contracted-away axis
    last, so the result lands in (C, W, H) orientation WITHOUT any
    transpose. ssim() combines only blurred signals elementwise and
    reduces to a scalar, so the orientation never needs to be restored.
    """
    h, w = img.shape[-2], img.shape[-1]
    bw = jnp.asarray(_band_matrix(w, window_size, sigma))
    bh = jnp.asarray(_band_matrix(h, window_size, sigma))
    hi = jax.lax.Precision.HIGHEST
    nd = img.ndim
    y = jax.lax.dot_general(  # blur along W: (..., H, W)
        img, bw, (((nd - 1,), (0,)), ((), ())), precision=hi)
    return jax.lax.dot_general(  # blur along H: -> (..., W, H)
        y, bh, (((nd - 2,), (0,)), ((), ())), precision=hi)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an image pair. Inputs [C, H, W] (or [N, C, H, W])."""
    if img1.ndim == 4:
        return jax.vmap(lambda a, b: ssim(a, b, window_size, sigma))(img1, img2).mean()
    blur = lambda x: _depthwise_filter(x, window_size, sigma)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()
