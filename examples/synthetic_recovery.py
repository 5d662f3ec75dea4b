#!/usr/bin/env python3
"""End-to-end quality demo on real hardware: scene recovery.

Renders a known synthetic gaussian cloud into a Blender-format dataset
with THIS renderer, then trains a fresh model from a noisy point init to
recover it, reporting novel-view PSNR (BASELINE.md "Quality" target run
on synthetic data, since the reference's NeRSemble assets are not
redistributable). Exercises the full production path on one chip: scene
readers -> loader threads -> jitted Pallas train step -> densification
surgery -> eval sweep -> PLY save.

Usage: python examples/synthetic_recovery.py [--iterations 2000]
"""

import json
import math
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp


def make_gt_scene(n=20_000, seed=0):
    rng = np.random.default_rng(seed)
    k = 16  # sh degree 3
    pts = rng.normal(0.0, 0.35, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-4.6, 0.4, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = np.zeros((n, k, 3), np.float32)
    # smooth color field so views are multi-view consistent and textured
    sh[:, 0] = 0.5 + 0.9 * np.sin(pts * np.array([3.0, 5.0, 7.0]))
    sh[:, 1:] = rng.normal(0, 0.02, (n, k - 1, 3))
    opac = rng.uniform(0.5, 0.95, n).astype(np.float32)
    return dict(
        means3d=jnp.asarray(pts), scales=jnp.asarray(scales),
        quats=jnp.asarray(quats), opacities=jnp.asarray(opac),
        shs=jnp.asarray(sh),
    )


def camera_pose(angle, elev, dist=4.0):
    pos = np.array([
        dist * math.cos(elev) * math.sin(angle),
        dist * math.sin(elev),
        -dist * math.cos(elev) * math.cos(angle),
    ])
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
    return c2w, c2w_gl


def render_dataset(root, gt, width, height, fovx, n_train=28, n_test=4):
    from PIL import Image

    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
    from gaussianavatars_tpu.ops.projection import CameraParams
    from gaussianavatars_tpu.ops.transforms import (
        camera_center_from_world_view,
        full_projection,
        perspective_projection,
        world_to_view,
    )

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    bg = jnp.ones(3)

    @jax.jit
    def render(viewmat, projmat, campos):
        cam = CameraParams(
            viewmatrix=viewmat, projmatrix=projmat, campos=campos,
            tan_fovx=jnp.asarray(math.tan(fovx / 2)),
            tan_fovy=jnp.asarray(math.tan(fovy / 2)),
            width=width, height=height,
        )
        out = rasterize(
            gt["means3d"], gt["scales"], gt["quats"], gt["opacities"],
            gt["shs"], 3, cam, bg, capacity=1 << 20, tile_size=32,
            chunk=128, backend=backend, binning_impl="dense",
        )
        return out.image, out.instance_total

    splits = {"train": [], "test": []}
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    views = [("train", i, 2 * math.pi * i / n_train,
              0.5 * math.sin(2 * math.pi * i / 7)) for i in range(n_train)]
    views += [("test", i, 2 * math.pi * (i + 0.37) / n_test, 0.21 + 0.1 * i)
              for i in range(n_test)]
    proj = perspective_projection(0.01, 100.0, fovx, fovy)
    for split, i, angle, elev in views:
        c2w, c2w_gl = camera_pose(angle, elev)
        R = c2w[:3, :3]                      # cam-to-world rotation
        T = -R.T @ c2w[:3, 3]                # world-to-cam translation
        wv = world_to_view(R, T)
        img, total = render(
            jnp.asarray(wv), jnp.asarray(full_projection(wv, proj)),
            jnp.asarray(camera_center_from_world_view(wv)))
        arr = np.asarray(jnp.clip(img, 0, 1).transpose(1, 2, 0))
        rgba = np.concatenate(
            [arr, np.ones_like(arr[..., :1])], -1)
        name = f"{split}/r_{i}"
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            os.path.join(root, name + ".png"))
        splits[split].append({
            "file_path": f"./{name}",
            "transform_matrix": c2w_gl.tolist(),
        })
    for split, frames in splits.items():
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)


def main():
    ap = ArgumentParser()
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--out", type=str, default="/tmp/synth_recovery")
    args = ap.parse_args()

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training
    import gaussianavatars_tpu.utils.ply as plyio

    root = os.path.join(args.out, "data")
    gt = make_gt_scene()
    print("[demo] rendering ground-truth dataset ...", flush=True)
    render_dataset(root, gt, args.width, args.height, fovx=0.8)

    # noisy init from the GT points (the COLMAP-points analog)
    rng = np.random.default_rng(1)
    xyz = np.asarray(gt["means3d"])[::4] + rng.normal(
        0, 0.02, (len(gt["means3d"][::4]), 3))
    plyio.store_point_cloud(
        os.path.join(root, "points3d.ply"), xyz,
        rng.random((len(xyz), 3)) * 255)

    model_cfg = ModelConfig(
        source_path=root, model_path=os.path.join(args.out, "out"),
        bind_to_mesh=False, eval=True, sh_degree=3, white_background=True,
    )
    it = args.iterations
    opt_cfg = OptimizationConfig(
        iterations=it, densify_from_iter=500,
        densify_until_iter=int(0.75 * it), densification_interval=300,
        opacity_reset_interval=10 * it, position_lr_max_steps=it,
    )
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    pipe_cfg = PipelineConfig(backend=backend, capacity=1 << 20)

    print(f"[demo] training {it} iterations on {jax.devices()[0]} ...",
          flush=True)
    t0 = time.time()
    model, state, info = training(
        model_cfg, opt_cfg, pipe_cfg,
        testing_iterations={it}, saving_iterations={it},
    )
    dt = time.time() - t0
    tl = info["timeline"]
    steady = None
    if len(tl) >= 4:
        (i0, t0_), (i1, t1_) = tl[len(tl) // 2], tl[-1]
        steady = round((i1 - i0) / max(t1_ - t0_, 1e-9), 2)
    print(json.dumps({
        "iterations": it,
        "wall_s": round(dt, 1),
        "steps_per_s": round(it / dt, 2),
        "steady_steps_per_s": steady,
        "final_ema_loss": round(float(info["ema_loss"]), 5),
        "n_gaussians": int(model.n_alive),
    }))


if __name__ == "__main__":
    main()
