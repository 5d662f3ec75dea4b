"""Scene container: dataset detection, camera sets, model initialization.

Equivalent of reference scene/__init__.py:31-166. Detects the dataset type
by sentinel files, loads cameras + meshes + point cloud, wires the gaussian
model (create or load), and owns artifact saving.
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np

from gaussianavatars_tpu.data.cameras import Camera, camera_to_json
from gaussianavatars_tpu.data.readers import (
    SceneInfo,
    read_blender_scene,
    read_colmap_scene,
    read_dynamic_nerf_scene,
)


def search_max_iteration(folder: str) -> int:
    """reference utils/system_utils.py:26-28."""
    saved = [int(f.split("_")[-1]) for f in os.listdir(folder)]
    return max(saved)


class Scene:
    def __init__(self, cfg, gaussians, load_iteration: Optional[int] = None,
                 shuffle: bool = True, resolution_scales=(1.0,)):
        """cfg: ModelConfig; gaussians: GaussianModel/FlameGaussianModel."""
        self.model_path = cfg.model_path
        self.gaussians = gaussians
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        # dataset sniffing (reference scene/__init__.py:90-99)
        src = cfg.source_path
        if os.path.exists(os.path.join(src, "sparse")):
            info = read_colmap_scene(src, cfg.images, cfg.eval)
        elif os.path.exists(os.path.join(src, "canonical_flame_param.npz")):
            print("Found canonical_flame_param.npz, assuming DynamicNerf data")
            info = read_dynamic_nerf_scene(
                src, cfg.white_background, cfg.eval,
                target_path=cfg.target_path,
            )
        elif os.path.exists(os.path.join(src, "transforms_train.json")):
            print("Found transforms_train.json, assuming Blender data")
            info = read_blender_scene(src, cfg.white_background, cfg.eval)
        else:
            raise ValueError(f"Could not recognize scene type for {src}")
        self.scene_info = info

        if not self.loaded_iter:
            if info.ply_path is not None:
                with open(info.ply_path, "rb") as src_f, open(
                    os.path.join(self.model_path, "input.ply"), "wb"
                ) as dst_f:
                    dst_f.write(src_f.read())
            cam_json = [
                camera_to_json(i, cam)
                for i, cam in enumerate(info.test_cameras + info.train_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(info.train_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]

        # optional camera filter (reference scene/__init__.py:124-128)
        if getattr(cfg, "select_camera_id", -1) != -1:
            info.train_cameras[:] = [
                c for c in info.train_cameras
                if c.camera_id == cfg.select_camera_id
            ]

        self.train_cameras = info.train_cameras
        self.val_cameras = info.val_cameras
        self.test_cameras = info.test_cameras
        self.resolution_arg = cfg.resolution

        # mesh-driven models get their FLAME params
        if hasattr(gaussians, "load_meshes") and (
            info.train_meshes or info.tgt_train_meshes
        ):
            gaussians.load_meshes(
                info.train_meshes, info.test_meshes,
                info.tgt_train_meshes, info.tgt_test_meshes,
            )

        if self.loaded_iter:
            gaussians.load_ply(
                os.path.join(self.model_path, "point_cloud",
                             f"iteration_{self.loaded_iter}",
                             "point_cloud.ply"),
                has_target=bool(cfg.target_path),
            )
        else:
            gaussians.create_from_pcd(
                info.points, info.colors, self.cameras_extent
            )

    # ------------------------------------------------------------------

    def get_train_cameras(self) -> list[Camera]:
        return self.train_cameras

    def get_val_cameras(self) -> list[Camera]:
        return self.val_cameras

    def get_test_cameras(self) -> list[Camera]:
        return self.test_cameras

    def save(self, iteration: int):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
        self.gaussians.save_ply(path)
