"""Orbit/trackball camera for the interactive viewers.

Equivalent of reference utils/viewer_utils.py:20-202 (OrbitCamera +
intrinsics->projection). Internal state is OpenGL-convention; queried
matrices convert to the requested convention, and `full_proj_transform` /
`world_view_transform` are produced in the layout the network-GUI protocol
sends (the server negates columns, viewer/network_gui.py).
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import Literal, Tuple

import numpy as np
from scipy.spatial.transform import Rotation as R


def projection_from_intrinsics(K: np.ndarray, image_size: Tuple[int, int],
                               near: float = 0.01, far: float = 10.0,
                               flip_y: bool = False, z_sign=-1) -> np.ndarray:
    """Pinhole intrinsics -> clip-space projection (camera x right, y up).

    Accepts K as (N,3,3) matrices or (N,4) [fx, fy, cx, cy] rows.
    """
    b = K.shape[0]
    h, w = image_size
    if K.shape[-2:] == (3, 3):
        fx, fy = K[..., 0, 0], K[..., 1, 1]
        cx, cy = K[..., 0, 2], K[..., 1, 2]
    elif K.shape[-1] == 4:
        fx, fy, cx, cy = (K[..., i] for i in range(4))
    else:
        raise ValueError(f"bad intrinsics shape {K.shape}")

    proj = np.zeros((b, 4, 4), np.float64)
    proj[:, 0, 0] = 2.0 * fx / w
    proj[:, 1, 1] = 2.0 * fy / h
    proj[:, 0, 2] = (w - 2.0 * cx) / w
    proj[:, 1, 2] = (h - 2.0 * cy) / h
    proj[:, 2, 2] = z_sign * (far + near) / (far - near)
    proj[:, 2, 3] = -2.0 * far * near / (far - near)
    proj[:, 3, 2] = z_sign
    if flip_y:
        proj[:, 1, 1] *= -1
    return proj


class OrbitCamera:
    """Trackball orbit camera with save/load (camera.json)."""

    def __init__(self, width: int, height: int, r: float = 2.0,
                 fovy: float = 60.0, znear: float = 0.01, zfar: float = 10.0,
                 convention: Literal["opengl", "opencv"] = "opengl",
                 save_path: str = "camera.json"):
        self.image_width = width
        self.image_height = height
        self.radius_default = r
        self.fovy_default = fovy
        self.znear = znear
        self.zfar = zfar
        self.convention = convention
        self.save_path = save_path
        self.reset()
        self.load()

    def reset(self):
        self.rot = R.identity()
        self.look_at = np.zeros(3, np.float32)
        self.radius = self.radius_default
        self.fovy = self.fovy_default
        self.z_sign = 1 if self.convention == "opencv" else -1
        self.y_sign = 1 if self.convention == "opencv" else -1

    # -- persistence --------------------------------------------------------

    def save(self):
        with open(self.save_path, "w") as f:
            json.dump({
                "rotation": self.rot.as_matrix().tolist(),
                "look_at": self.look_at.tolist(),
                "radius": self.radius,
                "fovy": self.fovy,
            }, f, indent=4)

    def load(self):
        if not Path(self.save_path).exists():
            return
        with open(self.save_path) as f:
            d = json.load(f)
        self.rot = R.from_matrix(np.asarray(d["rotation"]))
        self.look_at = np.asarray(d["look_at"])
        self.radius = d["radius"]
        self.fovy = d["fovy"]

    def clear(self):
        if os.path.exists(self.save_path):
            os.remove(self.save_path)

    # -- derived quantities --------------------------------------------------

    @property
    def fovx(self) -> float:
        focal = self.image_height / (2.0 * np.tan(np.radians(self.fovy) / 2))
        return float(np.degrees(
            2.0 * np.arctan(self.image_width / (2.0 * focal))
        ))

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.image_height / (2.0 * np.tan(np.radians(self.fovy) / 2))
        return np.array([
            focal, focal, self.image_width // 2, self.image_height // 2,
        ])

    @property
    def projection_matrix(self) -> np.ndarray:
        return projection_from_intrinsics(
            self.intrinsics[None], (self.image_height, self.image_width),
            self.znear, self.zfar, z_sign=self.z_sign,
        )[0]

    @property
    def pose(self) -> np.ndarray:
        """camera-to-world in the selected convention."""
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] += self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot.as_matrix()
        pose = rot @ pose
        pose[:3, 3] -= self.look_at
        if self.convention == "opencv":
            pose[:, [1, 2]] *= -1
        return pose

    @property
    def world_view_transform(self) -> np.ndarray:
        return np.linalg.inv(self.pose)

    @property
    def full_proj_transform(self) -> np.ndarray:
        return self.projection_matrix @ self.world_view_transform

    # -- interaction ---------------------------------------------------------

    def orbit_x(self, angle: float):
        axis = self.rot.as_matrix()[:3, 0]
        self.rot = R.from_rotvec(axis * angle) * self.rot

    def orbit_y(self, angle: float):
        axis = self.rot.as_matrix()[:3, 1]
        self.rot = R.from_rotvec(axis * angle) * self.rot

    def orbit_z(self, angle: float):
        axis = self.rot.as_matrix()[:3, 2]
        self.rot = R.from_rotvec(axis * angle) * self.rot

    def trackball(self, p: np.ndarray, q: np.ndarray, rot_begin=None):
        axis = np.cross(p, q)
        angle = np.arccos(np.clip(np.dot(p, q), -1.0, 1.0))
        rotvec = axis * angle
        base = self.rot if rot_begin is None else rot_begin
        self.rot = base * R.from_rotvec(rotvec)

    def scale(self, delta: float):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx=0.0, dy=0.0, dz=0.0):
        d = np.array([dx, -dy, dz])
        self.look_at += (
            2.0 * self.rot.as_matrix()[:3, :3] @ d
            * self.radius / self.image_height
            * math.tan(np.radians(self.fovy) / 2)
        )
