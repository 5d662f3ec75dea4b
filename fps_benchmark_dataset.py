#!/usr/bin/env python3
"""FPS benchmark over dataset views (reference fps_benchmark_dataset.py).

Loads a trained run + its dataset, takes the first view of each split
(excluding image IO from timing) and reports render FPS per split.
"""

import sys
import time

import numpy as np
from argparse import ArgumentParser

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
from gaussianavatars_tpu.config import (
    ModelConfig,
    PipelineConfig,
    get_combined_config,
)


def main(argv=None):
    parser = ArgumentParser()
    ModelConfig.add_to_parser(parser, sentinel=True)
    PipelineConfig.add_to_parser(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--n_iter", type=int, default=500)
    parser.add_argument("--n_rounds", type=int, default=3)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_val", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--vis", action="store_true",
                        help="save the benchmarked frame per split")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_config(parser, argv)

    import jax
    import jax.numpy as jnp

    model_cfg = ModelConfig.extract(args)
    pipe_cfg = PipelineConfig.extract(args)
    if jax.default_backend() != "tpu":
        pipe_cfg.backend = "jnp"
        pipe_cfg.chunk = 16

    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
    from gaussianavatars_tpu.models.gaussians import GaussianModel
    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn

    if model_cfg.bind_to_mesh:
        model = FlameGaussianModel(model_cfg.sh_degree)
    else:
        model = GaussianModel(model_cfg.sh_degree)
    scene = Scene(model_cfg, model, load_iteration=args.iteration,
                  shuffle=False)
    bound = getattr(model, "binding", None) is not None
    flame_param = dict(model.flame_param) if bound else {}
    binding = model.binding_device() if bound else None
    active = model.active_mask()

    skips = {"train": args.skip_train, "val": args.skip_val,
             "test": args.skip_test}
    for split, cams in (
        ("train", scene.get_train_cameras()),
        ("val", scene.get_val_cameras()),
        ("test", scene.get_test_cameras()),
    ):
        if not cams or skips[split]:
            continue
        cam = cams[0]
        p = cam.to_params(*cam.resolution(model_cfg.resolution))
        render = make_render_fn(model, pipe_cfg, p.width, p.height,
                                model.active_sh_degree)
        bg = jnp.asarray(cam.bg, jnp.float32)
        ts = jnp.asarray(cam.timestep or 0, jnp.int32)
                # vary the params per call INSIDE the jit: tunneled TPU frontends
        # dedup repeated dispatches unless the change flows through the
        # computation, which would fake the FPS
        import jax as _jax

        @_jax.jit
        def salted(salt, params, fp, ca, bg, ts):
            return render(params._replace(xyz=params.xyz + salt), fp,
                          binding, active, ca, bg, ts)

        salts = [jnp.full((3,), 1e-7 * (i + 1), jnp.float32)
                 for i in range(args.n_iter)]
        ca = camera_arrays(p)
        img = salted(salts[0], model.params, flame_param, ca, bg, ts)
        jax.block_until_ready(img)
        for r in range(args.n_rounds):
            t0 = time.perf_counter()
            for i in range(args.n_iter):
                img = salted(salts[i], model.params, flame_param, ca, bg, ts)
            jax.block_until_ready(img)
            dt = time.perf_counter() - t0
            print(f"{split} round {r}: {args.n_iter / dt:.2f} fps "
                  f"({p.width}x{p.height})")
        if args.vis:
            from PIL import Image

            arr = np.clip(np.asarray(img) * 255 + 0.5, 0, 255).astype(
                np.uint8)
            Image.fromarray(arr.transpose(1, 2, 0)).save(
                f"fps_benchmark_{split}.png")
            print(f"saved fps_benchmark_{split}.png")


if __name__ == "__main__":
    main()
