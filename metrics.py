#!/usr/bin/env python3
"""Offline metric evaluation over rendered-vs-gt image directories
(reference metrics.py:36-103 interface): PSNR / SSIM / LPIPS(vgg),
writing results.json + per_view.json per scene."""

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401


def read_images(renders_dir: Path, gt_dir: Path):
    import numpy as np
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        with Image.open(renders_dir / fname) as r:
            renders.append(
                np.asarray(r.convert("RGB"), np.float32).transpose(2, 0, 1)
                / 255.0
            )
        with Image.open(gt_dir / fname) as g:
            gts.append(
                np.asarray(g.convert("RGB"), np.float32).transpose(2, 0, 1)
                / 255.0
            )
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, splits=("test",)):
    import jax.numpy as jnp
    from tqdm import tqdm

    from gaussianavatars_tpu.metrics_lib.lpips import LPIPS, lpips_available
    from gaussianavatars_tpu.ops.ssim import ssim
    from gaussianavatars_tpu.utils.image import psnr

    lpips_fn = LPIPS() if lpips_available() else None
    if lpips_fn is None:
        print("[warn] LPIPS weights unavailable; reporting SSIM/PSNR only")

    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict, per_view = {}, {}
        for split in splits:
            split_dir = Path(scene_dir) / split
            if not split_dir.exists():
                continue
            for method in os.listdir(split_dir):
                method_dir = split_dir / method
                renders, gts, names = read_images(
                    method_dir / "renders", method_dir / "gt")

                ssims, psnrs, lpipss = [], [], []
                for r, g in tqdm(list(zip(renders, gts)),
                                 desc=f"{split}/{method}"):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim(rj, gj)))
                    psnrs.append(float(psnr(rj, gj)[0]))
                    if lpips_fn is not None:
                        lpipss.append(float(lpips_fn(r, g)[0]))

                import numpy as np

                print(f"  SSIM : {np.mean(ssims):>12.7f}")
                print(f"  PSNR : {np.mean(psnrs):>12.7f}")
                if lpipss:
                    print(f"  LPIPS: {np.mean(lpipss):>12.7f}")

                entry = {"SSIM": float(np.mean(ssims)),
                         "PSNR": float(np.mean(psnrs))}
                pv = {
                    "SSIM": dict(zip(names, ssims)),
                    "PSNR": dict(zip(names, psnrs)),
                }
                if lpipss:
                    entry["LPIPS"] = float(np.mean(lpipss))
                    pv["LPIPS"] = dict(zip(names, lpipss))
                full_dict[method] = entry
                per_view[method] = pv

        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict, f, indent=True)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=True)


if __name__ == "__main__":
    parser = ArgumentParser(description="Metric evaluation parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+",
                        type=str, default=[])
    parser.add_argument("--splits", nargs="+", type=str,
                        default=["test", "val", "train"])
    args = parser.parse_args()
    evaluate(args.model_paths, args.splits)
