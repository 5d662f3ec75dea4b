"""Linear blend skinning core for parametric head models (FLAME).

Pure-jnp, fully differentiable re-implementation of the smplx-style LBS
pipeline the reference uses (reference flame_model/lbs.py:25-304). The
5-joint kinematic chain is unrolled in Python (depth <= 3), so XLA sees a
flat graph of small matmuls — no scan/sequential dependency beyond the
chain itself.

All matmuls carry f32 precision pins: vertex positions feed the rigging
frames that position every gaussian, and bf16 MXU default would visibly
wobble the avatar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [N, 3] -> rotation matrices [N, 3, 3] (Rodrigues).

    Keeps the reference's epsilon convention (flame_model/lbs.py:40: the
    scalar 1e-8 is added to the *components* before the norm) so outputs
    match bit-for-bit at theta ~ 0.
    """
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=1, keepdims=True)  # [N,1]
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[:, None]   # [N,1,1]
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * K + (1.0 - cos) * jnp.matmul(K, K, precision=_HI)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """[B, L] x [V, 3, L] -> per-vertex displacement [B, V, 3]
    (reference flame_model/lbs.py:218-239).

    Evaluated as ONE flat 2D matmul (B, L) @ (L, V*3): the einsum over the
    [V, 3, L] operand earns per-channel layout slices from XLA (~0.5 ms/step
    at FLAME size); flattening a CONSTANT basis is free at compile time.
    """
    v = shape_disps.shape[0]
    mat = shape_disps.reshape(v * 3, -1)                   # [(V*3), L]
    out = jnp.matmul(betas, mat.T, precision=_HI)          # [B, V*3]
    return out.reshape(betas.shape[0], v, 3)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """[J, V] x [B, V, 3] -> joints [B, J, 3] (lbs.py:198-215)."""
    return jnp.einsum("bik,ji->bjk", vertices, j_regressor, precision=_HI)


def batch_rigid_transform(rot_mats, joints, parents):
    """Compose the kinematic chain (lbs.py:254-304), unrolled.

    Args:
      rot_mats: [B, J, 3, 3]; joints: [B, J, 3]; parents: python list/np.
    Returns:
      (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]).
    """
    parents = [int(p) for p in parents]
    b, j = joints.shape[:2]
    dtype = joints.dtype

    rel_joints = [joints[:, 0]]
    for i in range(1, j):
        rel_joints.append(joints[:, i] - joints[:, parents[i]])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)        # [B,3,4]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), (b, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)           # [B,4,4]

    local = [make_tf(rot_mats[:, i], rel_joints[i]) for i in range(j)]
    chain = [local[0]]
    for i in range(1, j):
        chain.append(jnp.matmul(chain[parents[i]], local[i], precision=_HI))
    transforms = jnp.stack(chain, axis=1)                        # [B,J,4,4]

    posed_joints = transforms[:, :, :3, 3]

    # subtract the rest-pose joint contribution to get relative transforms
    joints_h = jnp.concatenate(
        [joints, jnp.zeros((b, j, 1), dtype)], axis=-1
    )                                                             # [B,J,4]
    shifted = jnp.einsum(
        "bjmn,bjn->bjm", transforms, joints_h, precision=_HI
    )                                                             # [B,J,4]
    correction = jnp.zeros_like(transforms).at[:, :, :, 3].set(shifted)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms


def lbs(pose, v_shaped, posedirs, j_regressor, parents, lbs_weights):
    """Skinning (reference flame_model/lbs.py:101-195).

    Args:
      pose: [B, J*3] axis-angle per joint (global first).
      v_shaped: [B, V, 3] shaped template (incl. blendshape + offsets).
      posedirs: [(J-1)*9, V*3] pose-corrective basis.
      j_regressor: [J, V]; parents: [J]; lbs_weights: [V, J].
    Returns:
      (verts [B, V, 3], posed_joints [B, J, 3], root-relative A[:, 1]).
    """
    b = pose.shape[0]
    num_joints = j_regressor.shape[0]

    joints = vertices2joints(j_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(b, -1, 3, 3)

    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(b, -1)       # [B,(J-1)*9]
    pose_offsets = jnp.matmul(
        pose_feature, posedirs, precision=_HI
    ).reshape(b, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_tf = batch_rigid_transform(rot_mats, joints, parents)

    # weighted skinning transforms: [V, J] x [B, J, 16] -> [B, V, 4, 4]
    T = jnp.einsum(
        "vj,bjmn->bvmn", lbs_weights, rel_tf, precision=_HI
    )
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((b, v_posed.shape[1], 1), v_posed.dtype)], axis=-1
    )
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h, precision=_HI)[..., :3]
    return verts, posed_joints, rel_tf[:, 1]


def vertices2landmarks(vertices, faces, lmk_faces_idx, lmk_bary_coords):
    """Barycentric landmark extraction (lbs.py:60-98).

    vertices [B, V, 3]; faces [F, 3]; lmk_faces_idx [L]; bary [L, 3].
    """
    lmk_faces = faces[lmk_faces_idx]              # [L, 3]
    lmk_verts = vertices[:, lmk_faces]            # [B, L, 3, 3]
    return jnp.einsum(
        "blfi,lf->bli", lmk_verts, lmk_bary_coords, precision=_HI
    )
