"""Training loss assembly (reference train.py:127-163).

All terms are computed with masked reductions over the visibility filter so
capacity padding and culled gaussians never contaminate the means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.ssim import ssim
from gaussianavatars_tpu.utils.image import l1_loss


def safe_norm(x: jnp.ndarray, axis=-1, eps: float = 1e-24) -> jnp.ndarray:
    """Norm with a NaN-free gradient at 0 (clamp inside the sqrt, so the
    zero vector takes the constant branch). The bound-gaussian xyz loss
    evaluates exactly at xyz=0 on fresh splats."""
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), eps))


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over entries where mask is True (0 if empty)."""
    total = jnp.sum(values * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def compute_losses(
    image: jnp.ndarray,          # [3, H, W]
    gt_image: jnp.ndarray,       # [3, H, W]
    visibility: jnp.ndarray,     # [C] bool
    params_xyz: jnp.ndarray,     # [C, 3] raw local xyz
    params_scaling: jnp.ndarray,  # [C, 3] raw log-scale
    face_scaling_per_gaussian,   # [C, 1] or None (bound models)
    opt_cfg,
    bound: bool,
):
    """Returns (total, dict of term values).

    Mirrors reference train.py:130-163; the dynamic-offset/laplacian/std
    terms are added by the caller (they need FLAME state).
    """
    vis = visibility.astype(jnp.float32)
    losses = {}
    losses["l1"] = l1_loss(image, gt_image) * (1.0 - opt_cfg.lambda_dssim)
    losses["ssim"] = (1.0 - ssim(image, gt_image)) * opt_cfg.lambda_dssim

    if bound:
        if opt_cfg.metric_xyz:
            metric_xyz = params_xyz * face_scaling_per_gaussian
            val = safe_norm(
                jax.nn.relu(metric_xyz - opt_cfg.threshold_xyz), axis=1
            )
            losses["xyz"] = masked_mean(val, vis) * opt_cfg.lambda_xyz
        else:
            val = jax.nn.relu(
                safe_norm(params_xyz, axis=1) - opt_cfg.threshold_xyz
            )
            losses["xyz"] = masked_mean(val, vis) * opt_cfg.lambda_xyz

        if opt_cfg.lambda_scale != 0.0:
            if opt_cfg.metric_scale:
                world_scale = jnp.exp(params_scaling) * face_scaling_per_gaussian
                val = safe_norm(
                    jax.nn.relu(world_scale - opt_cfg.threshold_scale), axis=1
                )
            else:
                val = safe_norm(
                    jax.nn.relu(
                        jnp.exp(params_scaling) - opt_cfg.threshold_scale
                    ),
                    axis=1,
                )
            losses["scale"] = masked_mean(val, vis) * opt_cfg.lambda_scale

    total = sum(losses.values())
    return total, losses
