"""Camera and mesh-frame geometry.

Numpy/JAX equivalents of reference utils/graphics_utils.py:
  - world/view/projection matrix builders (:31-71) in the reference's
    row-vector (transposed, glm-style) storage convention so saved cameras
    interchange bit-exactly,
  - fov<->focal (:73-77),
  - the per-triangle tangent frame + scale used for rigging (:116-135),
  - face/vertex normals (:105-156).

Matrix builders use numpy (host-side, once per camera); the triangle-frame
math is jnp and differentiable — it sits on the hot path of every training
step (reference scene/flame_gaussian_model.py:137-154).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# Camera matrices (host-side numpy; storage is TRANSPOSED like the reference,
# i.e. points transform as row vectors: p_view = p_world @ world_view).
# ----------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4, returned transposed (row-vector convention).

    `R` is the camera-to-world rotation (the reference stores R transposed,
    scene/dataset_readers.py:211); `t` is the world->camera translation.
    Optional recentering (translate/scale) matches getWorld2View2
    (utils/graphics_utils.py:38-49).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.T.astype(np.float32)


def perspective_projection(znear: float, zfar: float,
                           fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection 4x4, transposed (row-vector convention).

    Same frustum conventions as the reference (utils/graphics_utils.py:51-71):
    z maps to [0, zfar/(zfar-znear)] style range, w = +z.
    """
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_half_fovx
    P[1, 1] = 1.0 / tan_half_fovy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P.T


def full_projection(world_view_t: np.ndarray, proj_t: np.ndarray) -> np.ndarray:
    """Composite world->clip (both inputs transposed): p_clip = p @ (W @ P)."""
    return (world_view_t @ proj_t).astype(np.float32)


def camera_center_from_world_view(world_view_t: np.ndarray) -> np.ndarray:
    """Camera origin in world space from a transposed world->view matrix."""
    return np.linalg.inv(world_view_t)[3, :3].astype(np.float32)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


# ----------------------------------------------------------------------------
# Triangle frames (hot path, jnp, differentiable)
# ----------------------------------------------------------------------------

def _safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    norm2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax_rsqrt(jnp.maximum(norm2, eps))


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)


def compute_face_orientation(verts: jnp.ndarray, faces: jnp.ndarray):
    """Per-triangle orthonormal frame + isotropic scale for splat rigging.

    Construction matches reference utils/graphics_utils.py:116-135:
      a0 = normalize(v1 - v0)               (in-plane tangent)
      a1 = normalize(a0 x (v2 - v0))        (normal)
      a2 = -normalize(a1 x a0)              (bitangent; negated)
      scale = (|v1 - v0| + |a1 . (v2 - v0)|) / 2

    NOTE the scale uses the projection onto the *bitangent* a2 in the
    reference (s1 = dot(a2, v2-v0)); we reproduce that exactly.

    Args:
      verts: [V, 3] float.
      faces: [F, 3] int.
    Returns:
      (orient [F, 3, 3] with columns (a0, a1, a2), scale [F, 1]).
    """
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]

    e01 = v1 - v0
    e02 = v2 - v0
    a0 = _safe_normalize(e01)
    a1 = _safe_normalize(jnp.cross(a0, e02))
    a2 = -_safe_normalize(jnp.cross(a1, a0))

    orient = jnp.stack([a0, a1, a2], axis=-1)  # columns

    s0 = jnp.sqrt(jnp.maximum(jnp.sum(e01 * e01, axis=-1, keepdims=True), 1e-20))
    s1 = jnp.abs(jnp.sum(a2 * e02, axis=-1, keepdims=True))
    scale = (s0 + s1) / 2.0
    return orient, scale


def compute_face_center(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Triangle centroids [F, 3] (reference flame_gaussian_model.py:142)."""
    return (verts[faces[:, 0]] + verts[faces[:, 1]] + verts[faces[:, 2]]) / 3.0


def compute_face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized face normals [F, 3] (utils/graphics_utils.py:105-114)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    return jnp.cross(v1 - v0, v2 - v0)


def compute_vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals [V, 3] (utils/graphics_utils.py:137-156)."""
    fn = compute_face_normals(verts, faces)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    fallback = jnp.array([0.0, 0.0, 1.0], dtype=verts.dtype)
    norm2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    vn = jnp.where(norm2 > 1e-20, vn, fallback)
    return _safe_normalize(vn)
