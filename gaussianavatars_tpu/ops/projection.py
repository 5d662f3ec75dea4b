"""Differentiable screen-space projection of 3D Gaussians (EWA splatting).

TPU-native equivalent of the *preprocess* stage of the reference CUDA
rasterizer (submodule `diff-gaussian-rasterization`, invoked at
gaussian_renderer/__init__.py:86-94). Everything here is plain, vectorized
jnp: per-gaussian elementwise math that XLA fuses into a single kernel; the
MXU-heavy blending lives in ops/blend*.py.

Math contract (pinned by the upstream Inria design the reference depends on):
  * view-space position p_view = [p, 1] @ viewmatrix (row-vector, transposed
    matrix storage); cull when p_view.z <= 0.2
  * clip position p_hom = [p, 1] @ projmatrix; ndc = p_hom.xyz/(p_hom.w+1e-7)
  * pixel center = ndc2pix(ndc, size) = ((ndc + 1) * size - 1) / 2
  * 2D covariance = J W Sigma W^T J^T with the perspective Jacobian J
    evaluated at the frustum-clamped view position, plus a 0.3 px dilation
    on the diagonal
  * conic = inverse covariance; radius = ceil(3 sqrt(lambda_max))
  * color = max(eval_sh(deg, sh, normalize(p - campos)) + 0.5, 0)

Gradient convention: `means2d_offset` is a zeros-valued [N, 2] input added to
the *NDC* xy coordinates. Its cotangent equals the reference's
`viewspace_points.grad` (NDC-scaled screen gradient) that drives
densification (reference train.py:198, scene/gaussian_model.py:517-519).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.covariance import build_covariance_3d
from gaussianavatars_tpu.ops.sh import eval_sh_flat, eval_sh_flat_cmajor


class ProjectedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities (all [N, ...])."""

    means2d: jnp.ndarray      # [N, 2] pixel coordinates of the center
    depths: jnp.ndarray       # [N] view-space z
    conics: jnp.ndarray       # [N, 3] inverse 2D covariance (xx, xy, yy)
    colors: jnp.ndarray       # [N, 3] RGB from SH (>= 0)
    opacities: jnp.ndarray    # [N] in (0, 1)
    radii: jnp.ndarray        # [N] int32 pixel radius (0 = culled)
    valid: jnp.ndarray        # [N] bool visibility after culling
    r2_max: jnp.ndarray       # [N] max sq pixel distance at which alpha can
                              # still reach 1/255 (precise tile-cull bound)
    ext_x: jnp.ndarray = None  # [N] tight per-axis half extent (pixels):
    ext_y: jnp.ndarray = None  # min(radius, sqrt(tau*cov_xx)) — alpha >= 1/255
                               # requires |dx| <= sqrt(tau*cov_xx) because
                               # q >= dx^2/cov_xx for the conic quadratic
    tau: jnp.ndarray = None    # [N] 2*ln(255*op): the q-threshold for
                               # alpha >= 1/255 (exact ellipse tile cull)


class CameraParams(NamedTuple):
    """Static+dynamic camera description for one render.

    Matrices use the reference's transposed (row-vector) storage so cameras
    interchange with saved reference artifacts (scene/cameras.py:44-47).
    """

    viewmatrix: jnp.ndarray   # [4, 4] world->view, transposed
    projmatrix: jnp.ndarray   # [4, 4] world->clip composite, transposed
    campos: jnp.ndarray       # [3] camera center, world space
    tan_fovx: float
    tan_fovy: float
    width: int                # static
    height: int               # static


def _cov3d_components(scales, quats, scaling_modifier=1.0):
    """Sigma = R S S^T R^T as six [N] component vectors (xx,xy,xz,yy,yz,zz).

    Componentized (no [N,3,3] temporaries): small trailing dims are layout-
    hostile on TPU, and flat [N] vectors let XLA fuse the whole projection
    into one elementwise kernel.
    """
    from gaussianavatars_tpu.ops.quaternion import quat_normalize

    q = quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)

    s0 = (scaling_modifier * scales[..., 0]) ** 2
    s1 = (scaling_modifier * scales[..., 1]) ** 2
    s2 = (scaling_modifier * scales[..., 2]) ** 2

    cxx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    cxy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    cxz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    cyy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    cyz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    czz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return cxx, cxy, cxz, cyy, cyz, czz


def compute_cov2d_components(
    mean3d, cov3d_comps, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy,
):
    """EWA projection, fully componentized. Returns (xx, xy, yy) [N] each,
    including the 0.3 px low-pass dilation."""
    # view-space position (row-vector convention; viewmatrix transposed)
    vm = viewmatrix
    tx_ = mean3d[..., 0] * vm[0, 0] + mean3d[..., 1] * vm[1, 0] \
        + mean3d[..., 2] * vm[2, 0] + vm[3, 0]
    ty_ = mean3d[..., 0] * vm[0, 1] + mean3d[..., 1] * vm[1, 1] \
        + mean3d[..., 2] * vm[2, 1] + vm[3, 1]
    tz_ = mean3d[..., 0] * vm[0, 2] + mean3d[..., 1] * vm[1, 2] \
        + mean3d[..., 2] * vm[2, 2] + vm[3, 2]
    # Culled gaussians (z <= 0.2) never reach the blend, but their jacobian
    # must stay finite: a 0-cotangent times an inf-jacobian is NaN, and the
    # NaN would leak into shared upstream params (FLAME pose/expr).
    tz = jnp.maximum(tz_, 0.2)

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx_ / tz, -limx, limx) * tz
    ty = jnp.clip(ty_ / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    j00 = focal_x * inv_z
    j02 = -(focal_x * tx) * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -(focal_y * ty) * inv_z * inv_z

    # rows of M = J @ W with W = world->view rotation (vm[:3,:3].T):
    # M[0] = j00 * W_row0 + j02 * W_row2;  W_row_i = vm[:, i]
    m00 = j00 * vm[0, 0] + j02 * vm[0, 2]
    m01 = j00 * vm[1, 0] + j02 * vm[1, 2]
    m02 = j00 * vm[2, 0] + j02 * vm[2, 2]
    m10 = j11 * vm[0, 1] + j12 * vm[0, 2]
    m11 = j11 * vm[1, 1] + j12 * vm[1, 2]
    m12 = j11 * vm[2, 1] + j12 * vm[2, 2]

    cxx, cxy, cxz, cyy, cyz, czz = cov3d_comps
    # S = Sigma @ M^T columns, then cov2d = M @ S
    s0x = cxx * m00 + cxy * m01 + cxz * m02
    s1x = cxy * m00 + cyy * m01 + cyz * m02
    s2x = cxz * m00 + cyz * m01 + czz * m02
    s0y = cxx * m10 + cxy * m11 + cxz * m12
    s1y = cxy * m10 + cyy * m11 + cyz * m12
    s2y = cxz * m10 + cyz * m11 + czz * m12

    out_xx = m00 * s0x + m01 * s1x + m02 * s2x + 0.3
    out_xy = m00 * s0y + m01 * s1y + m02 * s2y
    out_yy = m10 * s0y + m11 * s1y + m12 * s2y + 0.3
    return out_xx, out_xy, out_yy


def compute_cov2d(
    mean3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA projection from full [N,3,3] covariances (compat wrapper)."""
    comps = (cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
             cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2])
    xx, xy, yy = compute_cov2d_components(
        mean3d, comps, viewmatrix, focal_x, focal_y, tan_fovx, tan_fovy
    )
    return jnp.stack([xx, xy, yy], axis=-1)


def ndc2pix(ndc: jnp.ndarray, size) -> jnp.ndarray:
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    camera: CameraParams,
    scaling_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project world-space gaussians to screen space (fully differentiable).

    Args:
      means3d: [N, 3] world positions.
      scales: [N, 3] linear (already exp-activated) scales.
      quats: [N, 4] wxyz rotations (normalized internally).
      opacities: [N] in (0,1) (already sigmoid-activated).
      shs: SH coefficients — flat [N, 3*K] CHANNEL-major (production
        layout, see ops/sh.eval_sh_flat_cmajor) or [N, K, 3]
        coefficient-major (reference-API compat); K >= (sh_degree+1)^2.
      sh_degree: active SH degree (static).
      camera: CameraParams.
      scaling_modifier: global scale multiplier (viewer control).
      means2d_offset: optional [N, 2] zeros; gradients w.r.t. it are the
        densification signal (NDC units).
      colors_precomp: optional [N, 3] overriding SH evaluation.
      cov3d_precomp: optional [N, 3, 3] overriding scale/rot covariance.

    Returns:
      ProjectedGaussians with culled entries flagged invalid (radius 0).
    """
    n = means3d.shape[0]
    focal_x = camera.width / (2.0 * camera.tan_fovx)
    focal_y = camera.height / (2.0 * camera.tan_fovy)

    ones = jnp.ones((n, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)

    hi = jax.lax.Precision.HIGHEST
    p_view = jnp.matmul(hom, camera.viewmatrix, precision=hi)
    depths = p_view[..., 2]
    in_front = depths > 0.2

    p_hom = jnp.matmul(hom, camera.projmatrix, precision=hi)
    # same finite-jacobian guard as in compute_cov2d: w == view z for this
    # projection, and only z > 0.2 survives culling
    w_safe = jnp.where(in_front, p_hom[..., 3], 1.0)
    p_w = 1.0 / (w_safe + 1e-7)
    ndc = p_hom[..., :3] * p_w[..., None]
    ndc_xy = ndc[..., :2]
    if means2d_offset is not None:
        ndc_xy = ndc_xy + means2d_offset
    means2d = jnp.stack(
        [
            ndc2pix(ndc_xy[..., 0], camera.width),
            ndc2pix(ndc_xy[..., 1], camera.height),
        ],
        axis=-1,
    )

    if cov3d_precomp is not None:
        comps = (cov3d_precomp[..., 0, 0], cov3d_precomp[..., 0, 1],
                 cov3d_precomp[..., 0, 2], cov3d_precomp[..., 1, 1],
                 cov3d_precomp[..., 1, 2], cov3d_precomp[..., 2, 2])
    else:
        comps = _cov3d_components(scales, quats, scaling_modifier)
    c2xx, c2xy, c2yy = compute_cov2d_components(
        means3d, comps, camera.viewmatrix, focal_x, focal_y,
        camera.tan_fovx, camera.tan_fovy,
    )
    cov2d = jnp.stack([c2xx, c2xy, c2yy], axis=-1)

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] ** 2
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack(
        [cov2d[..., 2] * inv_det, -cov2d[..., 1] * inv_det, cov2d[..., 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lambda_max = mid + disc

    # Conservative reach bound for precise tile culling: the quadratic form
    # q(d) = d^T conic d >= ||d||^2 / lambda_max(cov2d) (the conic's min
    # eigenvalue is 1/lambda_max), so alpha = op*exp(-q/2) >= 1/255
    # requires ||d||^2 <= 2*ln(255*op) * lambda_max. Dropping tiles whose
    # box lies wholly beyond that radius is image-exact (the blend skips
    # alpha < 1/255 anyway).
    tau = 2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-12))
    r2_max = jnp.where(tau > 0.0, tau * jnp.maximum(lambda_max, 0.0), -1.0)

    # Screen radius: min(3 sigma_max, opacity reach). The reach bound
    # tightens the rect for translucent gaussians (and zeroes it when the
    # peak alpha can never hit 1/255) without changing any blended pixel.
    radius_f = jnp.ceil(jnp.minimum(
        3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)),
        jnp.sqrt(jnp.maximum(r2_max, 0.0)),
    ))

    # Tight per-axis half extents for anisotropic tile rects: a pixel can
    # contribute only when q = d^T conic d <= tau, and q >= dx^2 / cov_xx
    # (the marginal bound of a PD quadratic), so |dx| <= sqrt(tau*cov_xx).
    # Intersected with the reference square rect (radius_f) this is a pure
    # tightening: no blended pixel is ever dropped, but elongated splats
    # stop claiming the square of their MAJOR axis in the minor direction.
    tau_pos = jnp.maximum(tau, 0.0)
    ext_x = jnp.minimum(radius_f, jnp.ceil(
        jnp.sqrt(tau_pos * jnp.maximum(c2xx, 0.0))))
    ext_y = jnp.minimum(radius_f, jnp.ceil(
        jnp.sqrt(tau_pos * jnp.maximum(c2yy, 0.0))))

    valid = in_front & det_ok
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    # Fully off-screen gaussians are culled here; exact tile-rect emptiness
    # is resolved in the binning stage.
    on_screen = (
        (means2d[..., 0] + radius_f >= 0.0)
        & (means2d[..., 0] - radius_f < camera.width)
        & (means2d[..., 1] + radius_f >= 0.0)
        & (means2d[..., 1] - radius_f < camera.height)
    )
    valid = valid & on_screen & (radii > 0)
    radii = jnp.where(valid, radii, 0)
    ext_x = jnp.where(valid, ext_x, 0.0)
    ext_y = jnp.where(valid, ext_y, 0.0)

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dirs = means3d - camera.campos
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        # 2D in/out/cotangent shapes keep XLA from assigning [N, K, C]
        # permuted layouts. A 2D `shs` is the production CHANNEL-major flat
        # layout (contiguous K-wide blocks, no interleaved slices); 3D
        # [N, K, 3] is the reference-API compat path (reshape is a free
        # bitcast when it arrives row-major).
        if shs.ndim == 2:
            colors = eval_sh_flat_cmajor(sh_degree, shs, dirs) + 0.5
        else:
            colors = eval_sh_flat(sh_degree, shs.reshape(n, -1), dirs) + 0.5
        colors = jnp.maximum(colors, 0.0)

    return ProjectedGaussians(
        means2d=means2d,
        depths=depths,
        conics=conics,
        colors=colors,
        opacities=opacities,
        radii=radii,
        valid=valid,
        r2_max=r2_max,
        ext_x=ext_x,
        ext_y=ext_y,
        tau=tau,
    )
