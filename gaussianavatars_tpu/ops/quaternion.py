"""Quaternion math in wxyz convention (the splat-model convention).

TPU-native equivalents of the reference's roma/torch quaternion usage:
  - quat product for the face<-local rotation chain
    (reference scene/gaussian_model.py:125-138 via roma.quat_product)
  - quat -> rotation matrix (reference utils/general_utils.py:78-99)
  - rotation matrix -> quat (reference scene/flame_gaussian_model.py:147 via
    roma.rotmat_to_unitquat)

All functions are vectorized over leading batch dims and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """Normalize quaternions along the last axis.

    The clamp sits INSIDE the sqrt so the zero quaternion has a zero (not
    NaN) gradient: sqrt's infinite slope at 0 never meets the chain rule.
    """
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(jnp.maximum(norm2, eps))


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b with wxyz layout.

    Composes rotations so that R(a*b) = R(a) @ R(b), matching the reference's
    face-frame composition q_world = q_face * q_local
    (scene/gaussian_model.py:137).
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize then convert wxyz quaternions to [..., 3, 3] matrices.

    Matches reference utils/general_utils.py:78-99 (build_rotation), which
    normalizes internally.
    """
    q = quat_normalize(q)
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
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4] (wxyz).

    Branch-free variant of Shepperd's method: compute all four candidate
    quaternions and select by the largest diagonal combination. This is
    numerically stable for all rotations and maps cleanly onto the VPU
    (no data-dependent control flow).
    """
    return rotmat_to_quat_components(
        m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
        m[..., 1, 0], m[..., 1, 1], m[..., 1, 2],
        m[..., 2, 0], m[..., 2, 1], m[..., 2, 2],
    )


def rotmat_to_quat_components(m00, m01, m02, m10, m11, m12, m20, m21, m22):
    """`rotmat_to_quat` on scalar matrix-entry arrays (componentized hot
    path: callers with flat per-column data skip the [..., 3, 3] packing)."""

    # Four squared magnitudes (up to scale 4): w, x, y, z dominant.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quats (unnormalized), one per dominant component.
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: non-negative w (roma's unitquat convention is sign-free;
    # the downstream quat product is sign-invariant at the rotation level).
    return jnp.where(q[..., 0:1] < 0.0, -q, q)
