#!/usr/bin/env python3
"""FPS benchmark on a demo avatar (reference fps_benchmark_demo.py:35-81).

Loads a trained point_cloud.ply (+flame_param.npz when bound), renders a
synthetic orbit camera at 802x550 for 500 iterations x 3 rounds and reports
FPS. Falls back to a synthetic 100k-gaussian scene when no --point_path is
given (the reference's demo blobs are downloads).
"""

import math
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--point_path", type=str, default=None)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--height", type=int, default=550)
    parser.add_argument("--width", type=int, default=802)
    parser.add_argument("--n_iter", type=int, default=500)
    parser.add_argument("--n_rounds", type=int, default=3)
    parser.add_argument("--radius", type=float, default=1.0)
    parser.add_argument("--fovy", type=float, default=20.0)
    parser.add_argument("--timestep", type=int, default=0)
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--slab_tile_rows", type=int, default=0,
                        help="render in tile-row windows (required beyond "
                             "~1440p on one chip)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gaussianavatars_tpu.config import PipelineConfig
    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn
    from gaussianavatars_tpu.viewer.orbit_camera import OrbitCamera
    from gaussianavatars_tpu.data.cameras import MiniCam

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    pipe = PipelineConfig(backend=backend, capacity=2 ** 21 + 2 ** 20,
                          chunk=128 if backend == "pallas" else 16,
                          slab_tile_rows=args.slab_tile_rows)

    if args.point_path:
        from gaussianavatars_tpu.models.flame_gaussians import (
            FlameGaussianModel,
        )
        from gaussianavatars_tpu.models.gaussians import GaussianModel

        if (Path(args.point_path).parent / "flame_param.npz").exists():
            model = FlameGaussianModel(args.sh_degree)
        else:
            model = GaussianModel(args.sh_degree)
        model.load_ply(args.point_path)
    else:
        print("[info] no --point_path: benchmarking a synthetic 100k scene")
        from gaussianavatars_tpu.benchmark import (
            make_bench_scene, scene_to_model,
        )

        model = scene_to_model(make_bench_scene(), args.sh_degree)

    bound = getattr(model, "binding", None) is not None
    cam = OrbitCamera(args.width, args.height, r=args.radius, fovy=args.fovy,
                      convention="opencv", save_path="/tmp/_bench_cam.json")
    mini = MiniCam(
        width=args.width, height=args.height,
        fovx=math.radians(cam.fovx), fovy=math.radians(cam.fovy),
        znear=cam.znear, zfar=cam.zfar,
        world_view_transform=cam.world_view_transform.T,
        full_proj_transform=cam.full_proj_transform.T,
        timestep=args.timestep,
    )
    p = mini.to_params()
    render = make_render_fn(model, pipe, p.width, p.height,
                            model.active_sh_degree)
    flame_param = dict(model.flame_param) if bound else {}
    binding = model.binding_device() if bound else None
    active = model.active_mask()
    bg = jnp.ones(3)
    ts = jnp.asarray(args.timestep, jnp.int32)

    # vary the params per call INSIDE the jit: tunneled TPU frontends
    # dedup repeated dispatches unless the change flows through the
    # computation, which would fake the FPS
    @jax.jit
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
        print(f"round {r}: {args.n_iter / dt:.2f} fps")

    if args.vis:
        from PIL import Image

        arr = np.clip(np.asarray(img) * 255 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr.transpose(1, 2, 0)).save("fps_benchmark_demo.png")
        print("saved fps_benchmark_demo.png")


if __name__ == "__main__":
    main()
