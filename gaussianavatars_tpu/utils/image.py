"""Image metrics and error visualization.

Equivalents of reference utils/image_utils.py:15-26 (PSNR / MSE / seismic
error maps) and utils/loss_utils.py:17-21 (L1/L2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a - b) ** 2).mean()


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE, images flattened per batch item ([..., C, H, W])."""
    diff = (a - b) ** 2
    return diff.reshape(diff.shape[:-3] + (-1,)).mean(axis=-1, keepdims=True)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB over [0,1] images (reference utils/image_utils.py:18-20)."""
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(a, b)))


def error_map(render: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Seismic-colormapped mean abs error (utils/image_utils.py:22-26).

    Host-side; inputs [C, H, W] in [0,1]; returns [3, H, W] uint8-scaled float.
    """
    import matplotlib

    err = np.abs(np.asarray(render) - np.asarray(gt)).mean(axis=0)
    cmap = matplotlib.colormaps.get_cmap("seismic")
    lo, hi = err.min(), err.max()
    norm = (err - lo) / max(hi - lo, 1e-12)
    colored = cmap(norm)[..., :3]  # [H, W, 3]
    return np.transpose(colored, (2, 0, 1)).astype(np.float32)
