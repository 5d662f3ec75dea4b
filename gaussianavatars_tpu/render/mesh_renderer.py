"""Non-differentiable mesh rasterizer for viewer/debug overlays.

TPU-native replacement for the reference's nvdiffrast dependency (N3;
mesh_renderer/__init__.py:183-274). Gradients are never consumed from this
path in the reference, so this is a plain z-buffered flat-shaded rasterizer
built from static-shape JAX ops:

  * every face rasterizes an SxS local patch around its screen bbox
    (head-mesh triangles are a few pixels at viewer resolutions; faces
    larger than the patch lose interior coverage — debug-only limitation)
  * the z-buffer is a two-pass scatter-min (depth, then face-id argmin)
  * shading matches the reference 'front' mode: white albedo x
    clamp(dot(camera-space normal, +z)), alpha = coverage

Returns RGBA; `render_mesh_overlay` composites over a background at a given
mesh opacity like the train-loop GUI path (reference train.py:85-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.projection import CameraParams, ndc2pix

PATCH = 32


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _rasterize_impl(verts_clip_xy, depths, cam_normals, faces,
                    width: int, height: int):
    f = faces.shape[0]
    v0 = verts_clip_xy[faces[:, 0]]
    v1 = verts_clip_xy[faces[:, 1]]
    v2 = verts_clip_xy[faces[:, 2]]
    z = (depths[faces[:, 0]] + depths[faces[:, 1]] + depths[faces[:, 2]]) / 3.0
    valid = (
        (depths[faces[:, 0]] > 0.01)
        & (depths[faces[:, 1]] > 0.01)
        & (depths[faces[:, 2]] > 0.01)
    )

    xmin = jnp.floor(jnp.minimum(jnp.minimum(v0[:, 0], v1[:, 0]), v2[:, 0]))
    ymin = jnp.floor(jnp.minimum(jnp.minimum(v0[:, 1], v1[:, 1]), v2[:, 1]))
    xmin = jnp.clip(xmin, 0, width - 1).astype(jnp.int32)
    ymin = jnp.clip(ymin, 0, height - 1).astype(jnp.int32)

    gy, gx = jnp.meshgrid(
        jnp.arange(PATCH, dtype=jnp.float32),
        jnp.arange(PATCH, dtype=jnp.float32),
        indexing="ij",
    )
    px = xmin[:, None, None] + gx[None]          # [F, P, P]
    py = ymin[:, None, None] + gy[None]

    def edge(a, b):
        return ((px - a[:, 0, None, None]) * (b[:, 1] - a[:, 1])[:, None, None]
                - (py - a[:, 1, None, None]) * (b[:, 0] - a[:, 0])[:, None, None])

    e0 = edge(v0, v1)
    e1 = edge(v1, v2)
    e2 = edge(v2, v0)
    inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    inside = inside & valid[:, None, None]
    inside = inside & (px < width) & (py < height)

    pix = (py.astype(jnp.int32) * width + px.astype(jnp.int32)).reshape(-1)
    depth_flat = jnp.broadcast_to(
        z[:, None, None], (f, PATCH, PATCH)
    ).reshape(-1)
    inside_flat = inside.reshape(-1)
    face_flat = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[:, None, None], (f, PATCH, PATCH)
    ).reshape(-1)

    big = jnp.float32(1e10)
    depth_flat = jnp.where(inside_flat, depth_flat, big)

    zbuf = jnp.full((height * width,), big).at[pix].min(depth_flat)
    # argmin pass: face ids where the depth matches the winner
    winner = jnp.where(
        depth_flat <= zbuf[pix] + 0.0, face_flat, jnp.int32(2**30)
    )
    winner = jnp.where(inside_flat, winner, jnp.int32(2**30))
    fid = jnp.full((height * width,), jnp.int32(2**30)).at[pix].min(winner)

    covered = (zbuf < big).reshape(height, width)
    fid = jnp.where(fid == 2**30, 0, fid).reshape(height, width)

    normal = cam_normals[fid]                                  # [H, W, 3]
    # 'front' lighting, winding-agnostic (|n.z|): the reference's one-sided
    # clamp(dot(n, z)) depends on mesh orientation conventions; for a debug
    # overlay the absolute value shades both sides identically
    diffuse = jnp.abs(normal[..., 2:3])
    rgb = jnp.broadcast_to(diffuse, fid.shape + (3,))
    alpha = covered.astype(jnp.float32)
    return rgb, alpha, zbuf.reshape(height, width), fid


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray,
                   camera: CameraParams):
    """Flat-shaded mesh raster. Returns (rgb [H,W,3], alpha [H,W],
    depth [H,W], face_id [H,W])."""
    verts = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)

    ones = jnp.ones((verts.shape[0], 1), jnp.float32)
    hom = jnp.concatenate([verts, ones], axis=-1)
    p_view = hom @ camera.viewmatrix
    depths = p_view[:, 2]
    p_hom = hom @ camera.projmatrix
    ndc = p_hom[:, :2] / (p_hom[:, 3:4] + 1e-7)
    xy = jnp.stack(
        [ndc2pix(ndc[:, 0], camera.width), ndc2pix(ndc[:, 1], camera.height)],
        axis=-1,
    )

    # camera-space flat normals
    vcam = p_view[:, :3]
    n = jnp.cross(
        vcam[faces_j[:, 1]] - vcam[faces_j[:, 0]],
        vcam[faces_j[:, 2]] - vcam[faces_j[:, 0]],
    )
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    return _rasterize_impl(
        xy, depths, n, faces_j, camera.width, camera.height
    )


def render_mesh_overlay(verts, faces, camera: CameraParams,
                        background=None, opacity: float = 0.5):
    """Composite the shaded mesh over a background image
    (reference train.py:85-93 blend rule). Returns [3, H, W]."""
    rgb, alpha, _, _ = rasterize_mesh(verts, faces, camera)
    rgb = jnp.transpose(rgb, (2, 0, 1))
    alpha = alpha[None]
    if background is None:
        background = jnp.ones_like(rgb)
    else:
        background = jnp.asarray(background)
    return (
        rgb * alpha * opacity
        + background * (alpha * (1.0 - opacity) + (1.0 - alpha))
    )
