"""Non-differentiable mesh rasterizer for viewer/debug overlays.

TPU-native replacement for the reference's nvdiffrast dependency (N3;
mesh_renderer/__init__.py:183-274). Gradients are never consumed from this
path in the reference, so this is a plain z-buffered flat-shaded rasterizer
built from static-shape JAX ops:

  * faces rasterize local patches around their screen bboxes in THREE
    passes (32 px for all faces, 128 px for the top-1024 larger faces,
    full-frame for the top-64 largest) — exact coverage at any triangle
    size without dynamic shapes; all passes scatter-min into one z-buffer
  * the z-buffer is a two-pass scatter-min (depth, then face-id argmin)
  * shading matches the reference modes: 'constant' and 'front'
    (clamped camera-axis diffuse, mesh_renderer/__init__.py:174-181);
    per-face albedo colors supported
  * `antialias=True` renders at 2x and box-filters down — the supersampled
    stand-in for dr.antialias edge smoothing (reference :267)

`render_mesh` returns the reference's output dict {albedo, normal,
diffuse, rgba}; `rasterize_mesh` keeps the light tuple API the viewers
use; `render_mesh_overlay` composites like the train-loop GUI path
(reference train.py:85-93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.projection import CameraParams, ndc2pix

# multi-resolution patch passes: (patch size or None=frame, bucket or None=all)
_PASSES = ((32, None), (128, 1024), (None, 64))
_BIG = jnp.float32(1e10)
_NOFACE = jnp.int32(2 ** 30)


def _pass_scatter(v0, v1, v2, z, valid, sel, patch, width, height,
                  lo_limit, hi_limit):
    """Scatter-min one patch pass. Returns (pix, depth, face) flat arrays.

    Faces whose bbox max-side falls outside (lo_limit, hi_limit] are
    masked (they belong to another pass).
    """
    v0s, v1s, v2s = v0[sel], v1[sel], v2[sel]
    zs = z[sel]
    side_x = (jnp.maximum(jnp.maximum(v0s[:, 0], v1s[:, 0]), v2s[:, 0])
              - jnp.minimum(jnp.minimum(v0s[:, 0], v1s[:, 0]), v2s[:, 0]))
    side_y = (jnp.maximum(jnp.maximum(v0s[:, 1], v1s[:, 1]), v2s[:, 1])
              - jnp.minimum(jnp.minimum(v0s[:, 1], v1s[:, 1]), v2s[:, 1]))
    side = jnp.maximum(side_x, side_y)
    ok = valid[sel] & (side > lo_limit)
    if hi_limit is not None:
        ok = ok & (side <= hi_limit)

    f = sel.shape[0]
    if patch is None:
        pw, ph = width, height
        xmin = jnp.zeros((f,), jnp.int32)
        ymin = jnp.zeros((f,), jnp.int32)
    else:
        pw = ph = patch
        xmin = jnp.clip(
            jnp.floor(jnp.minimum(jnp.minimum(v0s[:, 0], v1s[:, 0]),
                                  v2s[:, 0])), 0, width - 1
        ).astype(jnp.int32)
        ymin = jnp.clip(
            jnp.floor(jnp.minimum(jnp.minimum(v0s[:, 1], v1s[:, 1]),
                                  v2s[:, 1])), 0, height - 1
        ).astype(jnp.int32)

    gy, gx = jnp.meshgrid(
        jnp.arange(ph, dtype=jnp.float32),
        jnp.arange(pw, dtype=jnp.float32),
        indexing="ij",
    )
    px = xmin[:, None, None] + gx[None]          # [F, ph, pw]
    py = ymin[:, None, None] + gy[None]

    def edge(a, b):
        return ((px - a[:, 0, None, None]) * (b[:, 1] - a[:, 1])[:, None, None]
                - (py - a[:, 1, None, None]) * (b[:, 0] - a[:, 0])[:, None, None])

    e0 = edge(v0s, v1s)
    e1 = edge(v1s, v2s)
    e2 = edge(v2s, v0s)
    inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    inside = inside & ok[:, None, None]
    inside = inside & (px < width) & (py < height)

    pix = (py.astype(jnp.int32) * width + px.astype(jnp.int32)).reshape(-1)
    depth = jnp.where(
        inside, zs[:, None, None], _BIG
    ).reshape(-1)
    face = jnp.broadcast_to(
        sel[:, None, None], (f, ph, pw)
    ).reshape(-1)
    return pix, depth, face


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _rasterize_impl(verts_clip_xy, depths, faces, width: int, height: int):
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

    # route faces by bbox size to the three passes
    side_x = (jnp.maximum(jnp.maximum(v0[:, 0], v1[:, 0]), v2[:, 0])
              - jnp.minimum(jnp.minimum(v0[:, 0], v1[:, 0]), v2[:, 0]))
    side_y = (jnp.maximum(jnp.maximum(v0[:, 1], v1[:, 1]), v2[:, 1])
              - jnp.minimum(jnp.minimum(v0[:, 1], v1[:, 1]), v2[:, 1]))
    side = jnp.where(valid, jnp.maximum(side_x, side_y), -1.0)

    all_ids = jnp.arange(f, dtype=jnp.int32)
    parts = []
    lo = 0.0
    for patch, bucket in _PASSES:
        if bucket is None or bucket >= f:
            sel = all_ids
        else:
            _, sel = jax.lax.top_k(side, bucket)
            sel = sel.astype(jnp.int32)
        hi = None if patch is None else jnp.float32(patch - 1)
        parts.append(_pass_scatter(
            v0, v1, v2, z, valid, sel, patch, width, height,
            jnp.float32(lo), hi,
        ))
        if patch is None:
            break
        lo = float(patch - 1)

    pix = jnp.concatenate([p[0] for p in parts])
    depth_flat = jnp.concatenate([p[1] for p in parts])
    face_flat = jnp.concatenate([p[2] for p in parts])

    zbuf = jnp.full((height * width,), _BIG).at[pix].min(depth_flat)
    winner = jnp.where(depth_flat <= zbuf[pix], face_flat, _NOFACE)
    winner = jnp.where(depth_flat < _BIG, winner, _NOFACE)
    fid = jnp.full((height * width,), _NOFACE).at[pix].min(winner)

    covered = (zbuf < _BIG).reshape(height, width)
    fid = jnp.where(fid == _NOFACE, 0, fid).reshape(height, width)
    return covered, zbuf.reshape(height, width), fid


def _project(verts, faces_j, camera: CameraParams, width, height):
    ones = jnp.ones((verts.shape[0], 1), jnp.float32)
    hom = jnp.concatenate([verts, ones], axis=-1)
    p_view = hom @ camera.viewmatrix
    depths = p_view[:, 2]
    p_hom = hom @ camera.projmatrix
    ndc = p_hom[:, :2] / (p_hom[:, 3:4] + 1e-7)
    xy = jnp.stack(
        [ndc2pix(ndc[:, 0], width), ndc2pix(ndc[:, 1], height)], axis=-1
    )
    vcam = p_view[:, :3]
    n = jnp.cross(
        vcam[faces_j[:, 1]] - vcam[faces_j[:, 0]],
        vcam[faces_j[:, 2]] - vcam[faces_j[:, 0]],
    )
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return xy, depths, n


def _shade(normal, lighting_type):
    """Reference mesh_renderer/__init__.py:174-181 modes; 'front' uses the
    winding-agnostic |n.z| so either face orientation shades identically
    (the one-sided reference clamp depends on GL conventions we don't
    reproduce)."""
    if lighting_type == "constant":
        return jnp.ones_like(normal[..., :1])
    if lighting_type == "front":
        return jnp.clip(jnp.abs(normal[..., 2:3]), 0.0, 1.0)
    raise NotImplementedError(f"Unknown lighting type: {lighting_type}")


def render_mesh(verts, faces, camera: CameraParams, background_color=None,
                face_colors=None, lighting_type: str = "front",
                antialias: bool = False):
    """Reference NVDiffRenderer.render_from_camera equivalent
    (mesh_renderer/__init__.py:183-274): returns the dict
    {albedo [H,W,3], normal [H,W,3], diffuse [H,W,3], rgba [H,W,4]}.

    `background_color` is a 3-list/array (constant) or an [H,W,3] image;
    `face_colors` an optional [F,3] albedo table; `antialias` renders at
    2x and box-filters (the dr.antialias stand-in).
    """
    verts = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    w, h = camera.width, camera.height
    scale = 2 if antialias else 1
    rw, rh = w * scale, h * scale

    xy, depths, normals = _project(verts, faces_j, camera, rw, rh)
    covered, _, fid = _rasterize_impl(xy, depths, faces_j, rw, rh)

    normal = normals[fid]                                   # [H, W, 3]
    if face_colors is not None:
        albedo = jnp.asarray(face_colors, jnp.float32)[fid]
    else:
        albedo = jnp.ones(fid.shape + (3,), jnp.float32)
    diffuse = _shade(normal, lighting_type)
    rgb = albedo * diffuse
    alpha = covered.astype(jnp.float32)[..., None]
    rgba = jnp.concatenate([rgb, alpha], axis=-1)

    if background_color is None:
        background_color = [1.0, 1.0, 1.0]
    bg = jnp.asarray(background_color, jnp.float32)
    if bg.ndim == 1:
        bg_img = jnp.broadcast_to(bg, fid.shape + (3,))
    else:
        bg_img = bg
        if scale != 1:
            bg_img = jnp.repeat(jnp.repeat(bg_img, scale, 0), scale, 1)
    bg_rgba = jnp.concatenate(
        [bg_img, jnp.zeros(fid.shape + (1,), jnp.float32)], axis=-1
    )
    mask = covered[..., None]
    normal = jnp.where(mask, normal, bg_rgba[..., :3])
    diffuse3 = jnp.where(mask, jnp.broadcast_to(diffuse, normal.shape),
                         bg_rgba[..., :3])
    rgba = jnp.where(mask, rgba, bg_rgba)

    out = {"albedo": albedo, "normal": normal, "diffuse": diffuse3,
           "rgba": rgba}
    if scale != 1:
        out = {
            k: v.reshape(h, scale, w, scale, v.shape[-1]).mean(axis=(1, 3))
            for k, v in out.items()
        }
    return out


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray,
                   camera: CameraParams):
    """Flat-shaded mesh raster (viewer tuple API). Returns (rgb [H,W,3],
    alpha [H,W], depth [H,W], face_id [H,W])."""
    verts = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    xy, depths, normals = _project(
        verts, faces_j, camera, camera.width, camera.height
    )
    covered, zbuf, fid = _rasterize_impl(
        xy, depths, faces_j, camera.width, camera.height
    )
    diffuse = jnp.abs(normals[fid][..., 2:3])
    rgb = jnp.broadcast_to(diffuse, fid.shape + (3,))
    return rgb, covered.astype(jnp.float32), zbuf, fid


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
