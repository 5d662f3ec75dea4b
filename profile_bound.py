#!/usr/bin/env python3
"""Op-level xplane trace of the BOUND full train step vs the unbound one.

The bound step adds the per-frame FLAME drive (LBS -> face frames ->
binding chain -> world-space gaussians) and its VJP on top of the shared
render/loss/Adam machinery; this tool isolates where that overhead lands
so the staging work (VERDICT r3 item 3) is measured, not guessed.
"""
import collections
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.benchmark import (
    HEIGHT, SH_DEGREE, WIDTH, bench_camera, make_bound_bench_model,
)
from bench import autosize_capacity


def summarize(trace_dir, label, iters):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print(f"[{label}] no xplane file found")
        return
    data = jax.profiler.ProfileData.from_file(files[0])
    ops = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                if name.isdigit():
                    continue
                ops[name] += ev.duration_ns
    print(f"==== {label} ({iters} iters; per-iter ms) ====", flush=True)
    for name, ns in ops.most_common(64):
        print(f"  {ns/1e6/iters:9.3f} ms  {name[:140]}")


def main():
    from gaussianavatars_tpu.config import OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.models.flame_gaussians import (
        face_frames_from_verts,
    )
    from gaussianavatars_tpu.models.gaussians import world_space_gaussians
    from gaussianavatars_tpu.ops.rasterize_tiles import instance_demand
    from gaussianavatars_tpu.train import optim
    from gaussianavatars_tpu.train.loop import (
        StepState, binding_arg, camera_arrays, lr_pytree, make_train_step,
    )

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    model = make_bound_bench_model()
    opt_cfg = OptimizationConfig()
    cam = bench_camera()
    ca = camera_arrays(cam)
    bg = jnp.ones(3)

    _binding = model.binding_device()
    _active = model.active_mask()
    _flame_param = dict(model.flame_param)

    @jax.jit
    def _demand(params):
        verts = model.verts_at(_flame_param, 0)
        frames = face_frames_from_verts(verts[0], model.flame_model.j_faces)
        m, s, q, o, sh = world_space_gaussians(params, _binding, frames)
        return instance_demand(
            m, s, q, o, sh, SH_DEGREE, cam, tile_size=32, active=_active)

    demand, _ = _demand(model.params)
    pipe = PipelineConfig(backend=backend,
                          capacity=autosize_capacity(int(demand)),
                          chunk=128 if backend == "pallas" else 16)

    flame_tr = model.flame_trainable()
    flame_fixed = {k: v for k, v in model.flame_param.items()
                   if k not in flame_tr}
    mu, nu, count = optim.init({"gauss": model.params, "flame": flame_tr})
    state = StepState(
        params=model.params, flame_tr=flame_tr, mu=mu, nu=nu, count=count,
        max_radii2d=model.max_radii2d, grad_accum=model.xyz_gradient_accum,
        denom=model.denom,
    )
    step = make_train_step(model, opt_cfg, pipe, WIDTH, HEIGHT, SH_DEGREE,
                           model.num_timesteps)
    gt = jnp.asarray(
        np.random.default_rng(2).random((3, HEIGHT, WIDTH)).astype(np.float32))
    lrs = lr_pytree(opt_cfg, 1e-3, flame_tr, model.spatial_lr_scale or 1.0)
    bindd = binding_arg(model)
    active = model.active_mask()

    iters = 20
    cams_salted = [
        ca._replace(campos=np.asarray(ca.campos) + np.float32(1e-6 * (i + 1)))
        for i in range(iters + 1)
    ]

    def one(state, i):
        return step(state, flame_fixed, bindd, active, cams_salted[i], gt,
                    bg, np.int32(0), lrs)

    state, losses, probe = one(state, 0)
    jax.block_until_ready(state.params.xyz)
    print(f"capacity={pipe.capacity} probe={int(probe)}", flush=True)

    d = tempfile.mkdtemp(prefix="trace_bound_")
    try:
        with jax.profiler.trace(d):
            for i in range(iters):
                state, losses, probe = one(state, i + 1)
            jax.block_until_ready(state.params.xyz)
        summarize(d, "bound full step", iters)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
