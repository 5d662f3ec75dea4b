#!/usr/bin/env python3
"""End-to-end BOUND-avatar quality demo on real hardware.

The reference's core use case: an animatable FLAME-bound avatar trained
from multi-view, multi-timestep images (reference train.py + the
NeRSemble protocol). Its assets are license-gated, so this demo builds a
synthetic ground truth with the real topology dimensions: a FLAME head
(tests/flame_fixtures) driven through T timesteps of expression/jaw
motion, carrying a known bound gaussian cloud, rendered into a
DynamicNerf-format dataset with THIS renderer. A fresh model then trains
from the standard bound init (--bind_to_mesh semantics: one gaussian per
face, FLAME finetuning on) and is scored on held-out views:

  val  = novel-view synthesis (unseen camera, seen timesteps)
  test = self-reenactment (unseen camera+timestep combinations)

Exercises the full production path: DynamicNerf reader -> loader threads
-> jitted Pallas train step (FLAME drive + binding chain + 7-term loss)
-> densification surgery -> eval sweep -> PLY+flame_param save.

Usage: python examples/bound_avatar_recovery.py [--iterations 1500]
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

T_STEPS = 8
N_CAMS = 16         # NeRSemble-like rig width. The MIDDLE camera of each
                    # timestep is held out: the eval view must INTERPOLATE
                    # the training arc (an end-of-arc holdout makes val an
                    # extrapolation task where sparse-view floaters
                    # dominate the score instead of avatar quality).
                    # 15 train cams + the yaw trajectory below are ALSO
                    # what constrains view-dependent SH: with ~9 static
                    # directions a deg-2 splat (9 coeffs) can interpolate
                    # the training cameras exactly, and val collapses as
                    # SH degrees unlock (measured 25.9 -> 15.7 dB).
HOLD_OUT = N_CAMS // 2
N_RINGS = 2         # two elevation rings: a 2D view cone constrains
                    # view-dependent SH far better than one yaw arc (the
                    # r4 1-ring rig let deg-2 SH interpolate the training
                    # directions and val DEGRADED 26.6 -> 21.6 dB between
                    # iters 6k and 10k while train loss kept falling)
ELEVS = (-0.18, 0.18)
DIST = 1.1          # camera depth: the fixture head's LBS-deformed verts
                    # span ~0.6 units (r5 measured bbox), so the head
                    # fills most of the frame at FOVX 0.5 from here (the
                    # r4 value 0.55 put the rig INSIDE the cloud)
FOVX = 0.5


def write_dataset(data_dir, asset_dir, width, height, seed=0):
    """FLAME assets + transforms jsons + smooth per-timestep flame params.
    Images are placeholders until the GT render pass overwrites them."""
    from tests.dataset_fixtures import _camera_frame
    from tests.flame_fixtures import make_flame_assets
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(data_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "flame_param"), exist_ok=True)
    make_flame_assets(asset_dir, seed=seed)

    shape = rng.normal(0, 0.3, 300).astype(np.float32)
    # smooth expression/jaw trajectories (the self-reenactment signal)
    base_e = rng.normal(0, 0.25, 100).astype(np.float32)
    dir_e = rng.normal(0, 0.25, 100).astype(np.float32)
    for t in range(T_STEPS):
        ph = 2 * math.pi * t / T_STEPS
        np.savez(
            os.path.join(data_dir, "flame_param", f"{t:05d}.npz"),
            shape=shape,
            expr=(base_e * math.cos(ph) + dir_e * math.sin(ph))[None],
            # head yaw sweep across timesteps: varies each gaussian's view
            # direction set like real captured data (heads turn), which
            # regularizes SH along with the camera arc
            rotation=np.float32([[0.05 * math.sin(ph),
                                  0.35 * math.sin(ph + 0.7), 0]]),
            neck_pose=np.zeros((1, 3), np.float32),
            jaw_pose=np.float32([[0.08 + 0.05 * math.sin(ph), 0, 0]]),
            eyes_pose=np.zeros((1, 6), np.float32),
            translation=np.zeros((1, 3), np.float32),
            static_offset=np.zeros((1, 5023, 3), np.float32),
        )
    np.savez(os.path.join(data_dir, "canonical_flame_param.npz"),
             shape=shape)

    splits = {"train": [], "val": [], "test": []}
    img_id = 0
    placeholder = Image.fromarray(
        np.zeros((height, width, 3), np.uint8))
    for t in range(T_STEPS):
        for ring in range(N_RINGS):
            for c in range(N_CAMS):
                if c != HOLD_OUT:
                    split = "train"
                else:
                    # each ring's middle camera held out; alternate splits
                    # across rings AND timesteps so val (novel view) and
                    # test (self-reenactment) each cover both elevations
                    split = "val" if (t + ring) % 2 == 0 else "test"
                name = f"images/{img_id:05d}.png"
                placeholder.save(os.path.join(data_dir, name))
                angle = 2.0 * math.pi * (c / N_CAMS - 0.5) * 0.35
                # stagger the rings' yaws so view directions tile the cone
                angle += (ring - (N_RINGS - 1) / 2) * math.pi * 0.35 / N_CAMS
                elev = ELEVS[ring]
                frame = _camera_frame(angle, width, height, FOVX, t,
                                      ring * N_CAMS + c, name,
                                      f"flame_param/{t:05d}.npz", elev=elev)
                # pull the camera in close enough to fill the frame
                m = np.asarray(frame["transform_matrix"])
                m[:3, 3] *= DIST / 4.0
                frame["transform_matrix"] = m.tolist()
                splits[split].append(frame)
                img_id += 1
    for split, frames in splits.items():
        with open(os.path.join(data_dir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": FOVX, "frames": frames}, f)


def paint_gt_model(model, seed=0):
    """Give the standard bound init (1 gaussian/face) a KNOWN recoverable
    appearance: smooth color field over face centers, mid-high opacity.

    The synthetic FLAME fixture (random bases + procedural teeth on a
    noise sphere) produces a tail of DEGENERATE faces whose frame scale
    is up to ~25x the median (r5 measured max 0.19 vs median 0.008); at
    local scale 1 those splats engulf the entire camera rig and every GT
    image became a full-frame color gradient. Cap each face's WORLD
    splat scale at 3x the median via its local scaling so the GT is an
    actual head-shaped surface."""
    rng = np.random.default_rng(seed + 7)
    frames = model.face_frames_at(model.flame_param, 0)
    centers = np.asarray(frames.center)                  # [F, 3]
    n = model.n_alive
    dc = 0.4 + 0.35 * np.sin(centers[:n] * np.float32([9.0, 14.0, 23.0]))
    c = model.params.xyz.shape[0]

    fs = np.asarray(frames.scaling)[
        np.asarray(model.binding[:n])].reshape(n, 1)     # [n, 1]
    cap = 3.0 * float(np.median(fs))

    def pad(a):
        out = np.zeros((c,) + a.shape[1:], np.float32)
        out[:n] = a
        return jnp.asarray(out)

    # OPAQUE surface regime (sigmoid ~0.98): real captured heads are
    # near-opaque surfaces; semi-translucent GT blobs (the r4 fixture
    # used sigmoid ~0.85) make geometry view-ambiguous and cap novel-view
    # recovery ~10 dB below the opaque-surface scores the reference's
    # data regime supports
    op = np.full((n, 1), 4.0, np.float32)
    local_scale = rng.uniform(0.7, 1.4, (n, 3)).astype(np.float32)
    local_scale = np.minimum(local_scale, cap / np.maximum(fs, 1e-9))
    # local offsets are multiplied by the face scale too: keep degenerate
    # faces' gaussians ON the face instead of floating cap-widths away
    xyz = rng.normal(0, 0.15, (n, 3)).astype(np.float32)
    xyz = np.clip(xyz, -1.0, 1.0) * np.minimum(1.0, cap / np.maximum(fs, 1e-9))
    model.params = model.params._replace(
        xyz=pad(xyz),
        features_dc=pad(((dc - 0.5) / 0.28209479).astype(np.float32)),
        opacity=pad(op),
        scaling=pad(np.log(local_scale).astype(np.float32)),
    )


def render_gt_images(model, scene, model_cfg, pipe_cfg):
    """Render every camera with the GT model and overwrite the dataset
    images in place (Camera objects carry their on-disk paths)."""
    from PIL import Image

    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn

    bg = jnp.ones(3)
    render_fns = {}
    n_written = 0
    flame_full = dict(model.flame_param)
    for cams in (scene.get_train_cameras(), scene.get_val_cameras(),
                 scene.get_test_cameras()):
        for cam in cams:   # cameras only — never read the placeholders
            p = cam.to_params(*cam.resolution(model_cfg.resolution))
            key = (p.width, p.height)
            if key not in render_fns:
                render_fns[key] = make_render_fn(
                    model, pipe_cfg, p.width, p.height,
                    model.active_sh_degree)
            img = render_fns[key](
                model.params, flame_full, model.binding_device(),
                model.active_mask(), camera_arrays(p), bg,
                jnp.asarray(cam.timestep or 0, jnp.int32),
            )
            arr = np.asarray(jnp.clip(img, 0, 1)).transpose(1, 2, 0)
            Image.fromarray((arr * 255 + 0.5).astype(np.uint8)).save(
                cam.image_path)
            n_written += 1
    print(f"[demo] wrote {n_written} ground-truth renders")


def main():
    ap = ArgumentParser()
    ap.add_argument("--iterations", type=int, default=1500)
    ap.add_argument("--width", type=int, default=296)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--out", type=str, default="/tmp/bound_recovery")
    ap.add_argument("--test_every", type=int, default=0,
                    help="also run the val/test eval sweep every N "
                         "iterations (PSNR/SSIM trajectory; 0 = final only)")
    ap.add_argument("--densify_every", type=int, default=300)
    ap.add_argument("--no_finetune_flame", action="store_true",
                    help="freeze FLAME params at the dataset rig values "
                         "(this synthetic protocol's rig params are exact "
                         "GT, so finetuning can only drift them; real "
                         "captures should leave finetuning ON as the "
                         "reference does)")
    args = ap.parse_args()

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
    from gaussianavatars_tpu.train.loop import evaluate_splits, training

    data_dir = os.path.join(args.out, "data")
    asset_dir = os.path.join(args.out, "assets")
    write_dataset(data_dir, asset_dir, args.width, args.height)
    os.environ["FLAME_ASSET_DIR"] = asset_dir

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    model_cfg = ModelConfig(
        source_path=data_dir, model_path=os.path.join(args.out, "out"),
        bind_to_mesh=True, eval=True, sh_degree=2, white_background=True,
        not_finetune_flame_params=args.no_finetune_flame,
    )
    pipe_cfg = PipelineConfig(backend=backend, capacity=1 << 19,
                              chunk=128 if backend == "pallas" else 16)

    print("[demo] rendering ground-truth avatar dataset ...", flush=True)
    os.makedirs(model_cfg.model_path, exist_ok=True)
    gt_model = FlameGaussianModel(model_cfg.sh_degree)
    scene = Scene(model_cfg, gt_model)
    paint_gt_model(gt_model)
    render_gt_images(gt_model, scene, model_cfg, pipe_cfg)

    it = args.iterations
    opt_cfg = OptimizationConfig(
        iterations=it, densify_from_iter=400,
        densify_until_iter=int(0.7 * it),
        densification_interval=args.densify_every,
        opacity_reset_interval=10 * it, position_lr_max_steps=it,
    )
    tests = {it}
    if args.test_every:
        tests |= set(range(args.test_every, it + 1, args.test_every))
    print(f"[demo] training {it} iterations (bound, FLAME finetuning on) "
          f"on {jax.devices()[0]} ...", flush=True)
    t0 = time.time()
    model, state, info = training(
        model_cfg, opt_cfg, pipe_cfg,
        testing_iterations=tests, saving_iterations={it},
    )
    dt = time.time() - t0

    # final metrics from a fresh camera pass (val = novel view,
    # test = self-reenactment)
    probe = FlameGaussianModel(model_cfg.sh_degree)
    scene2 = Scene(model_cfg, probe)
    flame_fixed = {k: v for k, v in model.flame_param.items()
                   if k not in state.flame_tr}
    metrics = evaluate_splits(
        model, scene2, model_cfg, pipe_cfg, state, flame_fixed,
        jnp.ones(3))
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
        "n_gaussians": int(model.n_alive),
        "val_novel_view": {k: round(float(v), 4)
                           for k, v in metrics.get("val", {}).items()},
        "test_self_reenactment": {k: round(float(v), 4)
                                  for k, v in metrics.get("test", {}).items()},
    }))


if __name__ == "__main__":
    main()
