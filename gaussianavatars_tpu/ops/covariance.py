"""3D covariance construction for anisotropic Gaussians.

Equivalent of reference scene/gaussian_model.py:29-39 +
utils/general_utils.py:64-110: Sigma = R S S^T R^T built from per-gaussian
log-scales and wxyz quaternions, packed as the 6 upper-triangular entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.quaternion import quat_to_rotmat

# Small 3x3 products: always full f32 (TPU default matmul precision is bf16,
# which would visibly distort the projected conics).
_F32 = jax.lax.Precision.HIGHEST


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s): [N, 3, 3] (utils/general_utils.py:101-110)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray,
                        scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Full covariance Sigma = L L^T, [N, 3, 3]."""
    L = build_scaling_rotation(scaling_modifier * scales, quats)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision=_F32)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric [N,3,3] to upper-triangle [N,6] in the reference's
    (xx, xy, xz, yy, yz, zz) order (utils/general_utils.py:64-76)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: [N,6] -> [N,3,3]."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
