"""Unbound (Blender synthetic) training path + COLMAP parser round-trips."""

import json
import os
import struct

import numpy as np
import pytest


def make_blender_dataset(root, n=6, width=40, height=32, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    fovx = 0.8
    splits = {"train": [], "test": []}
    for i in range(n):
        split = "train" if i < n - 2 else "test"
        import math

        angle = 2 * math.pi * i / n
        dist = 4.0
        pos = np.array([dist * math.sin(angle), 0.0, -dist * math.cos(angle)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=1)
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = pos
        c2w_gl = c2w.copy()
        c2w_gl[:3, 1:3] *= -1

        name = f"{split}/r_{i}"
        img = (rng.random((height, width, 4)) * 255).astype(np.uint8)
        img[..., 3] = 255
        Image.fromarray(img, "RGBA").save(os.path.join(root, name + ".png"))
        splits[split].append({
            "file_path": f"./{name}",
            "transform_matrix": c2w_gl.tolist(),
        })

    for split, frames in splits.items():
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return root


def test_unbound_blender_training(tmp_path):
    """Blender dataset -> random point cloud init (kNN scales) -> training."""
    root = make_blender_dataset(str(tmp_path / "blender"))

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    out = str(tmp_path / "out")
    model_cfg = ModelConfig(
        source_path=root, model_path=out, bind_to_mesh=False,
        eval=True, sh_degree=1, white_background=True,
    )
    opt_cfg = OptimizationConfig(
        iterations=6, densify_from_iter=2, densify_until_iter=5,
        densification_interval=3, opacity_reset_interval=1000,
        position_lr_max_steps=6,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=1 << 17, chunk=16)

    # limit the generated point cloud for speed
    import gaussianavatars_tpu.utils.ply as plyio

    ply_path = os.path.join(root, "points3d.ply")
    rng = np.random.default_rng(1)
    xyz = rng.random((500, 3)) * 2.6 - 1.3
    plyio.store_point_cloud(ply_path, xyz,
                            (rng.random((500, 3)) * 255))

    model, state, info = training(model_cfg, opt_cfg, pipe_cfg,
                                  saving_iterations={6})
    assert model.binding is None
    assert model.n_alive >= 1
    hist = [l for _, l in info["history"]]
    assert all(np.isfinite(h) for h in hist)
    # unbound PLY round-trips without binding column
    from gaussianavatars_tpu.models.gaussians import GaussianModel

    m2 = GaussianModel(sh_degree=1)
    m2.load_ply(os.path.join(out, "point_cloud", "iteration_6",
                             "point_cloud.ply"))
    assert m2.binding is None
    assert m2.n_alive == model.n_alive


def test_unbound_checkpoint_resume(tmp_path):
    """Unbound models must resume from chkpnt npz (regression: the resume
    path called the FLAME-only merge_flame_trainable unconditionally)."""
    root = make_blender_dataset(str(tmp_path / "blender"))

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training
    import gaussianavatars_tpu.utils.ply as plyio

    rng = np.random.default_rng(1)
    xyz = rng.random((400, 3)) * 2.6 - 1.3
    plyio.store_point_cloud(os.path.join(root, "points3d.ply"), xyz,
                            rng.random((400, 3)) * 255)

    out = str(tmp_path / "out")
    model_cfg = ModelConfig(source_path=root, model_path=out,
                            bind_to_mesh=False, eval=True, sh_degree=1,
                            white_background=True)
    opt_cfg = OptimizationConfig(
        iterations=5, densify_from_iter=100, densify_until_iter=0,
        opacity_reset_interval=1000, position_lr_max_steps=5,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=1 << 17, chunk=16)
    training(model_cfg, opt_cfg, pipe_cfg, checkpoint_iterations={3})
    ckpt = os.path.join(out, "chkpnt3.npz")
    assert os.path.exists(ckpt)
    model, state, info = training(model_cfg, opt_cfg, pipe_cfg,
                                  start_checkpoint=ckpt)
    assert model.binding is None
    assert int(state.count) == 5


def test_colmap_binary_parsers(tmp_path):
    """Write COLMAP binary files per the format spec and parse them back."""
    from gaussianavatars_tpu.data.colmap import (
        read_cameras_binary, read_images_binary, read_points3d_binary,
        qvec2rotmat, rotmat2qvec,
    )

    cam_path = str(tmp_path / "cameras.bin")
    with open(cam_path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    cams = read_cameras_binary(cam_path)
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

    img_path = str(tmp_path / "images.bin")
    qvec = np.array([0.9, 0.1, 0.2, 0.3])
    qvec /= np.linalg.norm(qvec)
    with open(img_path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", *qvec))
        f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"frame_001.png\x00")
        f.write(struct.pack("<Q", 2))                      # two 2D points
        f.write(struct.pack("<ddq", 1.0, 2.0, -1))
        f.write(struct.pack("<ddq", 3.0, 4.0, 5))
    images = read_images_binary(img_path)
    assert images[7].name == "frame_001.png"
    np.testing.assert_allclose(images[7].qvec, qvec)

    pts_path = str(tmp_path / "points3D.bin")
    with open(pts_path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<QdddBBBd", i, 1.0 + i, 2.0, 3.0,
                                10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 7, 0))
    xyz, rgb, err = read_points3d_binary(pts_path)
    assert xyz.shape == (2, 3)
    np.testing.assert_allclose(xyz[1], [2.0, 2.0, 3.0])
    np.testing.assert_array_equal(rgb[0], [10, 20, 30])

    # quaternion round-trip
    R = qvec2rotmat(qvec)
    q2 = rotmat2qvec(R)
    np.testing.assert_allclose(np.abs(q2), np.abs(qvec), atol=1e-6)
