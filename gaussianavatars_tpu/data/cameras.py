"""Camera objects: host-side description + device CameraParams.

Equivalent of reference scene/cameras.py and utils/camera_utils.py. Cameras
are lightweight host records; `to_params()` builds the transposed-matrix
CameraParams consumed by the renderer (bit-compatible storage with the
reference, scene/cameras.py:44-47), and image loading/compositing happens
lazily in the data loader.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.projection import CameraParams
from gaussianavatars_tpu.ops.transforms import (
    camera_center_from_world_view,
    full_projection,
    perspective_projection,
    world_to_view,
)

ZNEAR = 0.01
ZFAR = 100.0

# resolution cap policy (reference utils/camera_utils.py:26-40)
MAX_AUTO_WIDTH = 1600


@dataclass
class Camera:
    """One training/eval view (reference scene/cameras.py:17-47)."""

    uid: int
    R: np.ndarray                  # [3,3] cam-to-world rotation (transposed storage)
    T: np.ndarray                  # [3] world-to-cam translation
    fovx: float
    fovy: float
    width: int
    height: int
    image_path: Optional[str] = None
    image_name: str = ""
    bg: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    timestep: Optional[int] = None
    camera_id: Optional[int] = None
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def world_view_transform(self) -> np.ndarray:
        return world_to_view(self.R, self.T, self.trans, self.scale)

    def to_params(self, width: Optional[int] = None,
                  height: Optional[int] = None) -> CameraParams:
        w = width or self.width
        h = height or self.height
        wv = self.world_view_transform()
        proj = perspective_projection(ZNEAR, ZFAR, self.fovx, self.fovy)
        # numpy leaves on purpose: eager jnp.asarray costs a full RPC
        # round trip per call on tunneled TPU frontends (~10 ms), while
        # numpy jit arguments ride the dispatch transfer (~0.1 ms)
        return CameraParams(
            viewmatrix=np.asarray(wv, np.float32),
            projmatrix=np.asarray(full_projection(wv, proj), np.float32),
            campos=np.asarray(camera_center_from_world_view(wv), np.float32),
            tan_fovx=math.tan(self.fovx * 0.5),
            tan_fovy=math.tan(self.fovy * 0.5),
            width=w,
            height=h,
        )

    def resolution(self, resolution_arg: int = -1,
                   resolution_scale: float = 1.0) -> tuple[int, int]:
        """Target (width, height) under the reference's policy
        (utils/camera_utils.py:20-49): explicit divisor if > 0, else
        auto-cap the width at 1600px."""
        w, h = self.width, self.height
        if resolution_arg in (1, 2, 4, 8):
            return (round(w / (resolution_scale * resolution_arg)),
                    round(h / (resolution_scale * resolution_arg)))
        if resolution_arg == -1:
            scale = (w / MAX_AUTO_WIDTH) if w > MAX_AUTO_WIDTH else 1.0
        else:
            scale = w / resolution_arg
        scale *= resolution_scale
        return round(w / scale), round(h / scale)


@dataclass
class MiniCam:
    """Viewer/GUI camera (reference scene/cameras.py:49-62): carries ready
    transposed matrices instead of R/T."""

    width: int
    height: int
    fovx: float
    fovy: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray
    timestep: int = 0

    def to_params(self) -> CameraParams:
        wv = np.asarray(self.world_view_transform, np.float32)
        return CameraParams(
            viewmatrix=jnp.asarray(wv),
            projmatrix=jnp.asarray(
                np.asarray(self.full_proj_transform, np.float32)
            ),
            campos=jnp.asarray(camera_center_from_world_view(wv)),
            tan_fovx=math.tan(self.fovx * 0.5),
            tan_fovy=math.tan(self.fovy * 0.5),
            width=self.width,
            height=self.height,
        )


def camera_to_json(uid: int, cam: Camera) -> dict:
    """reference utils/camera_utils.py:62-82 layout (cameras.json)."""
    w2c = np.zeros((4, 4))
    w2c[:3, :3] = cam.R.transpose()
    w2c[:3, 3] = cam.T
    w2c[3, 3] = 1.0
    c2w = np.linalg.inv(w2c)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3]
    from gaussianavatars_tpu.ops.transforms import fov2focal

    return {
        "id": uid,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
