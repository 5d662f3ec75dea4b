"""Shared test fixtures: synthetic cameras and gaussian scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.projection import CameraParams
from gaussianavatars_tpu.ops.transforms import (
    camera_center_from_world_view,
    full_projection,
    perspective_projection,
    world_to_view,
)


def make_camera(width=48, height=40, fovx=0.8, dist=4.0, angle=0.0,
                znear=0.01, zfar=100.0):
    """Camera on a circle around the origin, looking at it."""
    import math

    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    # camera-to-world rotation: look-at from position
    pos = np.array([dist * math.sin(angle), 0.0, -dist * math.cos(angle)])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=1)  # cam-to-world
    T = -R.T @ pos  # world-to-cam translation

    wv = world_to_view(R, T)
    proj = perspective_projection(znear, zfar, fovx, fovy)
    return CameraParams(
        viewmatrix=jnp.asarray(wv),
        projmatrix=jnp.asarray(full_projection(wv, proj)),
        campos=jnp.asarray(camera_center_from_world_view(wv)),
        tan_fovx=math.tan(fovx / 2),
        tan_fovy=math.tan(fovy / 2),
        width=width,
        height=height,
    )


def make_scene(n=64, seed=0, sh_degree=2, spread=1.0, scale_mean=-2.3):
    """Random gaussian cloud near the origin. Returns dict of arrays."""
    rng = np.random.default_rng(seed)
    k = (sh_degree + 1) ** 2
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = rng.normal(size=(n, k, 3)).astype(np.float32) * 0.3
    sh[:, 0] += 0.8  # keep colors mostly positive
    return dict(
        means3d=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * spread),
        scales=jnp.asarray(
            np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 + scale_mean)
        ),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)),
        shs=jnp.asarray(sh),
    )
