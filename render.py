#!/usr/bin/env python3
"""Offline rendering CLI (reference render.py:104-146 interface).

Renders the train/val/test splits (or a target motion for reenactment)
from a trained model, writes PNGs with a thread pool and assembles mp4s
via ffmpeg when available.
"""

import concurrent.futures
import os
import subprocess
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
from gaussianavatars_tpu.config import (
    ModelConfig,
    PipelineConfig,
    get_combined_config,
)


def write_image(path: Path, img):
    import numpy as np
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def render_set(model_cfg, pipe_cfg, name, iteration, cameras, model,
               render_mesh=False):
    import jax.numpy as jnp
    import numpy as np

    from gaussianavatars_tpu.data.loader import iterate_once
    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn

    if model_cfg.select_camera_id != -1:
        name = f"{name}_{model_cfg.select_camera_id}"
    iter_path = Path(model_cfg.model_path) / name / f"ours_{iteration}"
    render_path = iter_path / "renders"
    gts_path = iter_path / "gt"
    mesh_path = iter_path / "renders_mesh"

    bound = getattr(model, "binding", None) is not None
    binding = model.binding_device() if bound else None
    active = model.active_mask()
    flame_param = dict(model.flame_param) if bound else {}

    render_fns = {}
    futures = []
    with concurrent.futures.ThreadPoolExecutor(os.cpu_count()) as pool:
        for idx, (cam, gt) in enumerate(
            iterate_once(cameras, model_cfg.resolution)
        ):
            p = cam.to_params(*cam.resolution(model_cfg.resolution))
            key = (p.width, p.height)
            if key not in render_fns:
                render_fns[key] = make_render_fn(
                    model, pipe_cfg, p.width, p.height, model.active_sh_degree
                )
            img = render_fns[key](
                model.params, flame_param, binding, active,
                camera_arrays(p), jnp.asarray(cam.bg, jnp.float32),
                jnp.asarray(cam.timestep or 0, jnp.int32),
            )
            img = np.asarray(jnp.clip(img, 0.0, 1.0))
            futures.append(pool.submit(
                write_image, render_path / f"{idx:05d}.png", img))
            futures.append(pool.submit(
                write_image, gts_path / f"{idx:05d}.png", gt))

            if render_mesh and bound:
                from gaussianavatars_tpu.render.mesh_renderer import (
                    render_mesh_overlay,
                )

                frames_verts = model.verts_at(
                    {k: jnp.asarray(v) for k, v in flame_param.items()},
                    int(cam.timestep or 0),
                )
                overlay = render_mesh_overlay(
                    np.asarray(frames_verts[0]),
                    np.asarray(model.flame_model.faces), p,
                    background=gt, opacity=0.5,
                )
                futures.append(pool.submit(
                    write_image, mesh_path / f"{idx:05d}.png", overlay))
        concurrent.futures.wait(futures)

    for sub, out in ((render_path, "renders.mp4"), (gts_path, "gt.mp4")):
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "25", "-f", "image2",
                 "-pattern_type", "glob", "-i", f"{sub}/*.png",
                 "-pix_fmt", "yuv420p", str(iter_path / out)],
                check=False, capture_output=True,
            )
        except FileNotFoundError:
            pass


def main(argv=None):
    parser = ArgumentParser(description="Testing script parameters")
    ModelConfig.add_to_parser(parser, sentinel=True)
    PipelineConfig.add_to_parser(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_val", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--render_mesh", action="store_true")
    args = get_combined_config(parser, argv)
    print("Rendering " + args.model_path)

    model_cfg = ModelConfig.extract(args)
    pipe_cfg = PipelineConfig.extract(args)

    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
    from gaussianavatars_tpu.models.gaussians import GaussianModel

    if model_cfg.bind_to_mesh:
        model = FlameGaussianModel(model_cfg.sh_degree)
    else:
        model = GaussianModel(model_cfg.sh_degree)
    scene = Scene(model_cfg, model, load_iteration=args.iteration,
                  shuffle=False)

    if model_cfg.target_path:
        name = os.path.basename(os.path.normpath(model_cfg.target_path))
        render_set(model_cfg, pipe_cfg, name, scene.loaded_iter,
                   scene.get_train_cameras(), model, args.render_mesh)
    else:
        if not args.skip_train:
            render_set(model_cfg, pipe_cfg, "train", scene.loaded_iter,
                       scene.get_train_cameras(), model, args.render_mesh)
        if not args.skip_val:
            render_set(model_cfg, pipe_cfg, "val", scene.loaded_iter,
                       scene.get_val_cameras(), model, args.render_mesh)
        if not args.skip_test:
            render_set(model_cfg, pipe_cfg, "test", scene.loaded_iter,
                       scene.get_test_cameras(), model, args.render_mesh)


if __name__ == "__main__":
    main()
