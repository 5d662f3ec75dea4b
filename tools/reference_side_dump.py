#!/usr/bin/env python3
"""Produce a parity dump from the ORIGINAL GaussianAvatars environment.

Run this INSIDE the reference repo's conda env (CUDA, torch,
diff-gaussian-rasterization installed), from the reference repo root:

    python /path/to/this/reference_side_dump.py \
        --point_path media/306/point_cloud.ply --out /tmp/ref_dump

It renders the same deterministic 8-view orbit and probe-gradient loss as
tools/parity_vs_reference.py (shared manifest format), so the two dumps
compare directly:

    python tools/parity_vs_reference.py --compare parity_dump /tmp/ref_dump

This file intentionally uses the REFERENCE'S own modules (scene.*,
gaussian_renderer.render, utils.viewer_utils.OrbitCamera) so its output is
ground truth produced by the reference code path, not a re-implementation.
"""

import argparse
import json
import math
import os
import sys

import numpy as np

WIDTH, HEIGHT = 802, 550
N_VIEWS = 8
PROBE_SEED = 123


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point_path", type=str, required=True)
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--timestep", type=int, default=0)
    ap.add_argument("--out", type=str, default="ref_dump")
    args = ap.parse_args()

    import torch
    from gaussian_renderer import render
    from scene.cameras import MiniCam
    from scene.flame_gaussian_model import FlameGaussianModel
    from scene.gaussian_model import GaussianModel
    from utils.viewer_utils import OrbitCamera

    class Pipe:
        convert_SHs_python = False
        compute_cov3D_python = False
        debug = False

    bound = os.path.exists(
        os.path.join(os.path.dirname(args.point_path), "flame_param.npz"))
    gaussians = (FlameGaussianModel(args.sh_degree) if bound
                 else GaussianModel(args.sh_degree))
    gaussians.load_ply(args.point_path,
                       **({"has_target": False} if bound else {}))
    if bound:
        gaussians.select_mesh_by_timestep(args.timestep)

    os.makedirs(args.out, exist_ok=True)
    cams, cam_meta = [], []
    for i in range(N_VIEWS):
        oc = OrbitCamera(WIDTH, HEIGHT, r=1.0, fovy=20.0,
                         convention="opencv", save_path="/nonexistent.json")
        oc.orbit_y(2.0 * math.pi * i / N_VIEWS)
        wvt = torch.tensor(oc.world_view_transform.T, dtype=torch.float32,
                           device="cuda")
        fpt = torch.tensor(oc.full_proj_transform.T, dtype=torch.float32,
                           device="cuda")
        cam = MiniCam(WIDTH, HEIGHT, math.radians(oc.fovy),
                      math.radians(oc.fovx), oc.znear, oc.zfar, wvt, fpt,
                      timestep=args.timestep)
        cams.append(cam)
        cam_meta.append({
            "world_view_transform": oc.world_view_transform.T.tolist(),
            "full_proj_transform": oc.full_proj_transform.T.tolist(),
            "fovx": math.radians(oc.fovx), "fovy": math.radians(oc.fovy),
            "znear": oc.znear, "zfar": oc.zfar,
        })

    bg = torch.ones(3, device="cuda")
    for i, cam in enumerate(cams):
        with torch.no_grad():
            img = render(cam, gaussians, Pipe(), bg)["render"]
        np.save(os.path.join(args.out, f"view_{i}.npy"),
                img.detach().cpu().numpy().astype(np.float32))
        print(f"rendered view {i}")

    # probe gradients on view 0 (same pattern/seed as the TPU harness)
    rng = np.random.default_rng(PROBE_SEED)
    probe = torch.tensor(rng.random((3, HEIGHT, WIDTH)).astype(np.float32),
                         device="cuda")
    img = render(cams[0], gaussians, Pipe(), bg)["render"]
    loss = ((img - probe) ** 2).sum()
    loss.backward()
    n = gaussians._xyz.shape[0]
    np.savez(
        os.path.join(args.out, "grads.npz"),
        d_xyz=gaussians._xyz.grad.cpu().numpy(),
        d_opacity=gaussians._opacity.grad.cpu().numpy(),
        d_scaling=gaussians._scaling.grad.cpu().numpy(),
        d_rotation=gaussians._rotation.grad.cpu().numpy(),
        d_f_dc=gaussians._features_dc.grad.cpu().numpy(),
    )
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump({
            "width": WIDTH, "height": HEIGHT, "n_gaussians": int(n),
            "timestep": args.timestep, "probe_seed": PROBE_SEED,
            "cameras": cam_meta,
        }, f, indent=2)
    print(f"dump written to {args.out}")


if __name__ == "__main__":
    main()
