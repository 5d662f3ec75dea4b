"""Oracle splat rasterizer: naive O(N * pixels), exact, autodiff-friendly.

This is the executable specification of the renderer. It reproduces the
per-pixel front-to-back blending semantics of the reference CUDA rasterizer
(the tile kernel behind gaussian_renderer/__init__.py:86-94) in closed form:

  for gaussians sorted by view depth (front first):
    power = -0.5 (d^T conic d);        skip if power > 0
    alpha = min(0.99, opacity * exp(power));  skip if alpha < 1/255
    test_T = T * (1 - alpha);          stop pixel if test_T < 1e-4
    C += color * alpha * T;  T = test_T
  out = C + T * bg

The sequential recurrence is vectorized with a cumulative product of
(1 - alpha) along the depth-sorted axis; the early-out latch becomes a
monotone mask on the inclusive cumprod (exactly equivalent because T is
non-increasing and 'done' latches). Used as the correctness oracle for the
tile pipeline and the Pallas kernels, and as a CPU-runnable reference path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.projection import CameraParams, ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_pixels_reference(
    pix_xy: jnp.ndarray,      # [P, 2] pixel centers
    means2d: jnp.ndarray,     # [N, 2] depth-sorted (front first)
    conics: jnp.ndarray,      # [N, 3]
    colors: jnp.ndarray,      # [N, 3]
    opacities: jnp.ndarray,   # [N]
    active: jnp.ndarray,      # [P, N] or [N] bool: participate at this pixel
    bg: jnp.ndarray,          # [3]
):
    """Blend N depth-sorted gaussians into P pixels. Returns ([P,3], [P] T).

    `active` may be per-pixel ([P, N]) to express the CUDA tile-rect culling
    (a gaussian only touches pixels of tiles its 3-sigma rect covers).
    """
    if active.ndim == 1:
        active = jnp.broadcast_to(active[None, :], (pix_xy.shape[0], active.shape[0]))
    d = means2d[None, :, :] - pix_xy[:, None, :]              # [P, N, 2]
    power = -0.5 * (
        conics[None, :, 0] * d[..., 0] ** 2
        + conics[None, :, 2] * d[..., 1] ** 2
    ) - conics[None, :, 1] * d[..., 0] * d[..., 1]            # [P, N]

    # Clamp before exp so the power>0 reject branch can't generate inf
    # (which would poison gradients through the jnp.where).
    alpha = jnp.minimum(
        ALPHA_MAX, opacities[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    )
    contributes = (power <= 0.0) & (alpha >= ALPHA_MIN) & active
    alpha = jnp.where(contributes, alpha, 0.0)

    # Inclusive/exclusive transmittance products along the sorted axis.
    log_one_minus = jnp.log1p(-alpha)
    incl = jnp.exp(jnp.cumsum(log_one_minus, axis=1))          # T after i
    excl = incl / (1.0 - alpha)                                # T before i

    # Early-out latch: instance i contributes iff T_before*(1-alpha_i) >= eps
    # for it AND every earlier contributing instance (monotone => own test).
    mask = incl >= T_EPS
    weight = alpha * excl * mask                               # [P, N]

    color = jnp.matmul(weight, colors,
                       precision=jax.lax.Precision.HIGHEST)     # [P, 3] (MXU)
    # Final transmittance: product over applied instances only.
    t_final = jnp.exp(jnp.sum(log_one_minus * mask, axis=1))   # [P]
    return color + t_final[:, None] * bg[None, :], t_final


def rasterize_reference(
    proj: ProjectedGaussians,
    camera: CameraParams,
    bg: jnp.ndarray,
    tile_size: int = 16,
) -> jnp.ndarray:
    """Rasterize projected gaussians to a [3, H, W] image (oracle path).

    Reproduces the CUDA tile-rect culling exactly: a gaussian contributes to
    a pixel only when its 3-sigma tile rect covers that pixel's tile.
    """
    from gaussianavatars_tpu.ops.binning import compute_tile_rects

    h, w = camera.height, camera.width

    order = jnp.argsort(proj.depths)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = proj.colors[order]
    opacities = proj.opacities[order]
    valid = proj.valid[order]
    radii = proj.radii[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=means2d.dtype),
        jnp.arange(w, dtype=means2d.dtype),
        indexing="ij",
    )
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # [P, 2]

    x0, y0, x1, y1 = compute_tile_rects(means2d, radii, w, h, tile_size)
    ptx = (pix[:, 0] // tile_size).astype(jnp.int32)            # [P]
    pty = (pix[:, 1] // tile_size).astype(jnp.int32)
    in_rect = (
        (ptx[:, None] >= x0[None, :]) & (ptx[:, None] < x1[None, :])
        & (pty[:, None] >= y0[None, :]) & (pty[:, None] < y1[None, :])
    )                                                            # [P, N]
    active = in_rect & valid[None, :]

    color, _ = blend_pixels_reference(
        pix, means2d, conics, colors, opacities, active, bg
    )
    return color.reshape(h, w, 3).transpose(2, 0, 1)
