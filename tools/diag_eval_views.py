#!/usr/bin/env python3
"""Per-view eval diagnostics for a bound_avatar_recovery output dir:
renders every val/test view, prints per-view PSNR with its (timestep,
camera) identity, and writes render/GT/error PNGs for the worst views.

Usage: python tools/diag_eval_views.py --run /tmp/bound_q10kd --out /tmp/diag
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="bound_avatar_recovery --out dir (has data/, "
                         "assets/, out/)")
    ap.add_argument("--out", default="/tmp/diag_views")
    ap.add_argument("--worst", type=int, default=4)
    args = ap.parse_args()

    os.environ["FLAME_ASSET_DIR"] = os.path.join(args.run, "assets")

    import jax
    import jax.numpy as jnp

    from gaussianavatars_tpu.config import ModelConfig, PipelineConfig
    from gaussianavatars_tpu.data.loader import iterate_once
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
    from gaussianavatars_tpu.train.loop import (
        camera_arrays, make_render_fn,
    )
    from gaussianavatars_tpu.utils.image import psnr

    model_path = os.path.join(args.run, "out")
    data_dir = os.path.join(args.run, "data")
    model_cfg = ModelConfig(source_path=data_dir, model_path=model_path,
                            bind_to_mesh=True, eval=True, sh_degree=2,
                            white_background=True)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    pipe_cfg = PipelineConfig(backend=backend, capacity=1 << 19,
                              chunk=128 if backend == "pallas" else 16)

    model = FlameGaussianModel(model_cfg.sh_degree)
    scene = Scene(model_cfg, model, load_iteration=-1, shuffle=False)
    print(f"loaded iteration model: n={model.n_alive}, "
          f"sh={model.active_sh_degree}")
    model.active_sh_degree = model.max_sh_degree

    flame_full = jax.device_put(dict(model.flame_param))
    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    render_fns = {}
    rows = []
    for split, cams in (("val", scene.get_val_cameras()),
                        ("test", scene.get_test_cameras())):
        for cam, gt in iterate_once(cams, model_cfg.resolution):
            p = cam.to_params(*cam.resolution(model_cfg.resolution))
            key = (p.width, p.height)
            if key not in render_fns:
                render_fns[key] = make_render_fn(
                    model, pipe_cfg, p.width, p.height,
                    model.active_sh_degree)
            img = render_fns[key](
                model.params, flame_full, model.binding_device(),
                model.active_mask(), camera_arrays(p),
                jnp.asarray(cam.bg, jnp.float32),
                jnp.asarray(cam.timestep or 0, jnp.int32))
            img = np.clip(np.asarray(img), 0, 1)
            gt = np.clip(np.asarray(gt), 0, 1)
            p_db = float(np.asarray(psnr(jnp.asarray(img),
                                         jnp.asarray(gt))[0]))
            rows.append((split, int(cam.timestep or 0),
                         int(cam.camera_id or -1), p_db, img, gt))

    rows.sort(key=lambda r: r[3])
    print(f"{'split':5} {'t':>2} {'cam':>4} {'psnr':>7}")
    for split, t, c, p_db, _, _ in rows:
        print(f"{split:5} {t:>2} {c:>4} {p_db:7.2f}")

    for i, (split, t, c, p_db, img, gt) in enumerate(rows[:args.worst]):
        base = os.path.join(args.out, f"worst{i}_{split}_t{t}_c{c}")
        Image.fromarray((img.transpose(1, 2, 0) * 255).astype(np.uint8)
                        ).save(base + "_render.png")
        Image.fromarray((gt.transpose(1, 2, 0) * 255).astype(np.uint8)
                        ).save(base + "_gt.png")
        err = np.abs(img - gt).mean(0)
        Image.fromarray((np.clip(err * 4, 0, 1) * 255).astype(np.uint8)
                        ).save(base + "_err.png")
    print(f"wrote {min(args.worst, len(rows))} worst-view image triples "
          f"to {args.out}")


if __name__ == "__main__":
    main()
