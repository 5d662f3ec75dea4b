"""Gaussian splats rigged to a FLAME head.

Re-architecture of reference scene/flame_gaussian_model.py:21-269. The key
structural change for TPU: mesh driving is a *pure function*
(`face_frames_at`) evaluated inside the jitted train step, so FLAME
parameter gradients flow through the renderer into expr/pose/translation
without any module state, and the per-timestep select happens as a device
gather instead of host control flow.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.models.flame import FlameHead
from gaussianavatars_tpu.models.gaussians import FaceFrames, GaussianModel
from gaussianavatars_tpu.ops.quaternion import rotmat_to_quat
from gaussianavatars_tpu.ops.transforms import (
    compute_face_center,
    compute_face_orientation,
)

# FLAME parameter groups that get finetuned (reference
# flame_gaussian_model.py:174-217: pose, translation, expression).
FINETUNE_KEYS = ("rotation", "neck_pose", "jaw_pose", "eyes_pose",
                 "translation", "expr")


def face_frames_from_verts(verts: jnp.ndarray, faces: jnp.ndarray) -> FaceFrames:
    """Per-triangle frames from posed vertices [V, 3]
    (reference flame_gaussian_model.py:137-154).

    ONE triangle gather feeds orientation, scale, center AND quaternion
    (the reference's separate center/orientation calls would each pay a
    gather whose autodiff transpose is a [V, 3] scatter-add; fusing them
    leaves a single scatter in the backward). The packed (F, 17) `table`
    is built here from flat 2D pieces so the binding chain never touches a
    [F, 3, 3] layout.
    """
    from gaussianavatars_tpu.ops.quaternion import rotmat_to_quat_components
    from gaussianavatars_tpu.ops.transforms import _safe_normalize

    tri = verts[faces]                       # (F, 3, 3): ONE gather
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]

    # construction per reference utils/graphics_utils.py:116-135
    e01 = v1 - v0
    e02 = v2 - v0
    a0 = _safe_normalize(e01)
    a1 = _safe_normalize(jnp.cross(a0, e02))
    a2 = -_safe_normalize(jnp.cross(a1, a0))

    s0 = jnp.sqrt(jnp.maximum(
        jnp.sum(e01 * e01, axis=-1, keepdims=True), 1e-20))
    s1 = jnp.abs(jnp.sum(a2 * e02, axis=-1, keepdims=True))
    scale = (s0 + s1) / 2.0
    center = (v0 + v1 + v2) / 3.0

    # orient matrix has COLUMNS (a0, a1, a2): row-major 9-vector rows are
    # [a0x a1x a2x | a0y a1y a2y | a0z a1z a2z]
    flat9 = jnp.stack(
        [a0[:, 0], a1[:, 0], a2[:, 0],
         a0[:, 1], a1[:, 1], a2[:, 1],
         a0[:, 2], a1[:, 2], a2[:, 2]], axis=1,
    )
    quat = rotmat_to_quat_components(
        a0[:, 0], a1[:, 0], a2[:, 0],
        a0[:, 1], a1[:, 1], a2[:, 1],
        a0[:, 2], a1[:, 2], a2[:, 2],
    )
    table = jnp.concatenate([flat9, scale, center, quat], axis=1)  # (F, 17)
    return FaceFrames(
        center=center, orient_mat=flat9.reshape(-1, 3, 3),
        orient_quat=quat, scaling=scale, table=table,
    )


class FlameGaussianModel(GaussianModel):
    def __init__(
        self,
        sh_degree: int,
        disable_flame_static_offset: bool = False,
        not_finetune_flame_params: bool = False,
        n_shape: int = 300,
        n_expr: int = 100,
        flame_head: Optional[FlameHead] = None,
        capacity_granularity: int = 8192,
        **flame_kwargs,
    ):
        super().__init__(sh_degree, capacity_granularity)
        self.disable_flame_static_offset = disable_flame_static_offset
        self.not_finetune_flame_params = not_finetune_flame_params
        self.n_shape = n_shape
        self.n_expr = n_expr

        self.flame_model = flame_head or FlameHead(
            n_shape, n_expr, add_teeth=True, **flame_kwargs
        )
        self.flame_param: dict[str, jnp.ndarray] | None = None
        self.flame_param_orig: dict[str, np.ndarray] | None = None

        # one gaussian per triangle at init (reference :39-41)
        n_faces = self.flame_model.num_faces
        self.binding = np.arange(n_faces, dtype=np.int32)
        self.binding_counter = np.ones(n_faces, np.int32)

    # ------------------------------------------------------------------
    # FLAME parameter management
    # ------------------------------------------------------------------

    def load_meshes(self, train_meshes: dict, test_meshes: dict,
                    tgt_train_meshes: dict | None = None,
                    tgt_test_meshes: dict | None = None):
        """Build the per-timestep FLAME parameter dict from dataset meshes
        (reference flame_gaussian_model.py:43-89)."""
        if self.flame_param is not None:
            return
        tgt_train_meshes = tgt_train_meshes or {}
        tgt_test_meshes = tgt_test_meshes or {}
        meshes = {**train_meshes, **test_meshes}
        tgt_meshes = {**tgt_train_meshes, **tgt_test_meshes}
        pose_meshes = meshes if len(tgt_meshes) == 0 else tgt_meshes

        self.num_timesteps = max(pose_meshes) + 1
        t = self.num_timesteps
        num_verts = self.flame_model.num_verts

        first = meshes[min(meshes)]
        if not self.disable_flame_static_offset:
            static_offset = np.asarray(first["static_offset"], np.float32)
            static_offset = static_offset.reshape(-1, 3)
            if static_offset.shape[0] != num_verts:
                pad = num_verts - static_offset.shape[0]
                static_offset = np.pad(static_offset, ((0, pad), (0, 0)))
        else:
            static_offset = np.zeros((num_verts, 3), np.float32)

        n_expr = np.asarray(first["expr"]).reshape(-1).shape[0]
        param = {
            "shape": np.asarray(first["shape"], np.float32).reshape(-1),
            "expr": np.zeros((t, n_expr), np.float32),
            "rotation": np.zeros((t, 3), np.float32),
            "neck_pose": np.zeros((t, 3), np.float32),
            "jaw_pose": np.zeros((t, 3), np.float32),
            "eyes_pose": np.zeros((t, 6), np.float32),
            "translation": np.zeros((t, 3), np.float32),
            "static_offset": static_offset,
            "dynamic_offset": np.zeros((t, num_verts, 3), np.float32),
        }
        for i, mesh in pose_meshes.items():
            for k_src, k_dst in [
                ("expr", "expr"), ("rotation", "rotation"),
                ("neck_pose", "neck_pose"), ("jaw_pose", "jaw_pose"),
                ("eyes_pose", "eyes_pose"), ("translation", "translation"),
            ]:
                param[k_dst][i] = np.asarray(mesh[k_src], np.float32).reshape(
                    param[k_dst][i].shape
                )

        self.flame_param = {k: jnp.asarray(v) for k, v in param.items()}
        self.flame_param_orig = {k: v.copy() for k, v in param.items()}

    def flame_trainable(self) -> dict:
        """The finetuned subset as an optimizable pytree."""
        if self.not_finetune_flame_params or self.flame_param is None:
            return {}
        return {k: self.flame_param[k] for k in FINETUNE_KEYS}

    def merge_flame_trainable(self, trainable: dict):
        if self.flame_param is not None:
            self.flame_param.update(trainable)

    # ------------------------------------------------------------------
    # Mesh driving (pure, jit-friendly)
    # ------------------------------------------------------------------

    def verts_at(self, flame_param: dict, timestep,
                 return_verts_cano: bool = False):
        """FLAME forward at one timestep. `timestep` may be traced."""
        p = flame_param
        out = self.flame_model.forward(
            p["shape"][None],
            p["expr"][timestep][None],
            p["rotation"][timestep][None],
            p["neck_pose"][timestep][None],
            p["jaw_pose"][timestep][None],
            p["eyes_pose"][timestep][None],
            p["translation"][timestep][None],
            zero_centered_at_root_node=False,
            return_landmarks=False,
            return_verts_cano=return_verts_cano,
            static_offset=p["static_offset"][None],
            dynamic_offset=p["dynamic_offset"][timestep][None],
        )
        return out if return_verts_cano else out

    def face_frames_at(self, flame_param: dict, timestep) -> FaceFrames:
        """Frames for the binding chain at a (possibly traced) timestep."""
        verts = self.verts_at(flame_param, timestep)
        return face_frames_from_verts(verts[0], self.flame_model.j_faces)

    def select_mesh_by_timestep(self, timestep: int, original: bool = False):
        """Host-side convenience mirroring the reference API: computes and
        caches frames + verts for viewers/renderers."""
        self.timestep = timestep
        param = self.flame_param
        if original and self.flame_param_orig is not None:
            param = {k: jnp.asarray(v) for k, v in self.flame_param_orig.items()}
        verts, verts_cano = self.verts_at(param, timestep, return_verts_cano=True)
        self.verts = verts
        self.verts_cano = verts_cano
        self.frames = face_frames_from_verts(verts[0], self.flame_model.j_faces)
        return self.frames

    # ------------------------------------------------------------------
    # Regularizers (reference flame_gaussian_model.py:156-172)
    # ------------------------------------------------------------------

    def compute_dynamic_offset_loss(self, flame_param, timestep):
        off = flame_param["dynamic_offset"][timestep]
        return jnp.linalg.norm(off, axis=-1).mean()

    def compute_laplacian_loss(self, flame_param, timestep, verts_cano):
        offset = flame_param["dynamic_offset"][timestep][None]
        verts_wo = jax.lax.stop_gradient(verts_cano - offset)
        verts_w = verts_wo + offset
        lap_wo = jax.lax.stop_gradient(
            self.flame_model.laplacian_smooth(verts_wo)
        )
        lap_w = self.flame_model.laplacian_smooth(verts_w)
        diff = (lap_wo - lap_w) ** 2
        return diff.sum(axis=-1, keepdims=True).mean()

    # ------------------------------------------------------------------
    # IO (reference flame_gaussian_model.py:219-269)
    # ------------------------------------------------------------------

    def save_ply(self, path: str):
        super().save_ply(path)
        if self.flame_param is not None:
            npz_path = str(Path(path).parent / "flame_param.npz")
            np.savez(
                npz_path,
                **{k: np.asarray(v) for k, v in self.flame_param.items()},
            )

    def load_ply(self, path: str, has_target: bool = False,
                 motion_path: Optional[str] = None,
                 disable_fid: Optional[np.ndarray] = None):
        super().load_ply(path)

        if not has_target:
            npz_path = str(Path(path).parent / "flame_param.npz")
            if os.path.exists(npz_path):
                data = np.load(npz_path)
                self.flame_param = {
                    k: jnp.asarray(np.asarray(v, np.float32))
                    for k, v in data.items()
                }
                self.num_timesteps = self.flame_param["expr"].shape[0]

        if motion_path is not None:
            data = np.load(motion_path)
            motion = {
                k: jnp.asarray(v) for k, v in data.items()
                if v.dtype == np.float32
            }
            self.flame_param = {
                "shape": self.flame_param["shape"],
                "static_offset": self.flame_param["static_offset"],
                "translation": motion["translation"],
                "rotation": motion["rotation"],
                "neck_pose": motion["neck_pose"],
                "jaw_pose": motion["jaw_pose"],
                "eyes_pose": motion["eyes_pose"],
                "expr": motion["expr"],
                "dynamic_offset": motion["dynamic_offset"],
            }
            self.num_timesteps = self.flame_param["expr"].shape[0]

        if disable_fid is not None and len(disable_fid) > 0:
            n = self.n_alive
            keep = ~np.isin(self.binding[:n], disable_fid)
            arrays = {
                k: np.asarray(getattr(self.params, k))[:n][keep]
                for k in self.params._fields
            }
            self.binding = self.binding[:n][keep]
            self._install(arrays, int(keep.sum()))
