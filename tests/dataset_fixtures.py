"""Synthetic on-disk DynamicNerf-style avatar dataset for integration tests."""

import json
import os

import numpy as np

from .flame_fixtures import make_flame_assets
from .utils import make_camera


def _camera_frame(angle, width, height, fovx, timestep, cam_idx, file_path,
                  flame_path, elev=0.0):
    """Build a transforms.json frame matching the reader's conventions.
    `elev` (radians) lifts the camera off the equatorial ring (2D rigs
    constrain view-dependent SH much better than a 1D yaw arc)."""
    import math

    # invert the make_camera construction: produce a c2w in OpenGL convention
    dist = 4.0
    ce = math.cos(elev)
    pos = np.array([dist * ce * math.sin(angle), dist * math.sin(elev),
                    -dist * ce * math.cos(angle)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=1)   # cam-to-world (COLMAP)
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = pos
    # convert COLMAP convention back to OpenGL for the json
    c2w_gl = c2w.copy()
    c2w_gl[:3, 1:3] *= -1
    return {
        "file_path": file_path,
        "transform_matrix": c2w_gl.tolist(),
        "camera_angle_x": fovx,
        "w": width,
        "h": height,
        "timestep_index": timestep,
        "camera_index": cam_idx,
        "flame_param_path": flame_path,
    }


def make_avatar_dataset(root, n_timesteps=2, n_cams=3, width=48, height=40,
                        seed=0):
    """Creates FLAME assets + transforms_{train,val,test}.json + flame params
    + placeholder images. Returns (dataset_dir, asset_dir)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "avatar_data")
    asset_dir = os.path.join(root, "flame_assets")
    os.makedirs(os.path.join(data_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "flame_param"), exist_ok=True)
    make_flame_assets(asset_dir, seed=seed)

    fovx = 0.8
    # flame params per timestep
    for t in range(n_timesteps):
        np.savez(
            os.path.join(data_dir, "flame_param", f"{t:05d}.npz"),
            shape=rng.normal(0, 0.3, 300).astype(np.float32),
            expr=rng.normal(0, 0.2, (1, 100)).astype(np.float32),
            rotation=rng.normal(0, 0.05, (1, 3)).astype(np.float32),
            neck_pose=np.zeros((1, 3), np.float32),
            jaw_pose=np.abs(rng.normal(0, 0.05, (1, 3))).astype(np.float32),
            eyes_pose=np.zeros((1, 6), np.float32),
            translation=np.zeros((1, 3), np.float32),
            static_offset=np.zeros((1, 5023, 3), np.float32),
        )
    np.savez(
        os.path.join(data_dir, "canonical_flame_param.npz"),
        shape=rng.normal(0, 0.3, 300).astype(np.float32),
    )

    splits = {"train": [], "val": [], "test": []}
    img_id = 0
    for t in range(n_timesteps):
        for c in range(n_cams):
            split = "train" if c < n_cams - 1 else ("val" if t == 0 else "test")
            name = f"images/{img_id:05d}.png"
            img = (rng.random((height, width, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(data_dir, name))
            angle = 2.0 * np.pi * c / max(n_cams, 1) * 0.1
            splits[split].append(_camera_frame(
                angle, width, height, fovx, t, c, name,
                f"flame_param/{t:05d}.npz",
            ))
            img_id += 1

    for split, frames in splits.items():
        with open(os.path.join(data_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    return data_dir, asset_dir
