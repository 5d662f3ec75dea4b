#!/usr/bin/env python3
"""Per-trace-line busy/gap analysis of the full train step (dev tool).

Sums event time per xplane line (TensorCore vs DMA queues) and reports the
main compute line's busy fraction over the traced span — the direct answer
to "do the async copies stall the core or overlap it?".
Usage: profile_lines.py [--unbound]
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


def analyze(trace_dir, iters):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    data = jax.profiler.ProfileData.from_file(files[0])
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            evs = [(ev.start_ns, ev.duration_ns, ev.name)
                   for ev in line.events if not ev.name.isdigit()]
            if not evs:
                continue
            evs.sort()
            total = sum(d for _, d, _ in evs)
            span = evs[-1][0] + evs[-1][1] - evs[0][0]
            # merged busy time (events may nest/overlap within a line)
            busy = 0
            cur_s, cur_e = evs[0][0], evs[0][0]
            for s, d, _ in evs:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s = s
                cur_e = max(cur_e, s + d)
            busy += cur_e - cur_s
            print(f"  line {line.name!r:30s} events={len(evs):6d} "
                  f"sum={total/1e6/iters:8.3f} ms  busy={busy/1e6/iters:8.3f}"
                  f" ms  span={span/1e6/iters:8.3f} ms")


def main():
    import functools
    from profile_bound import __file__ as _  # noqa: F401  (same repo)

    # reuse profile_bound's setup by exec-ing its main with tracing replaced
    # is messy; instead duplicate the minimal step setup here
    from gaussianavatars_tpu.benchmark import (
        HEIGHT, SH_DEGREE, WIDTH, bench_camera, make_bench_scene,
        make_bound_bench_model, scene_to_model,
    )
    from bench import autosize_capacity
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

    unbound = "--unbound" in sys.argv
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if unbound:
        model = scene_to_model(make_bench_scene())
        model.reset_stats()
    else:
        model = make_bound_bench_model()
    opt_cfg = OptimizationConfig()
    cam = bench_camera()
    ca = camera_arrays(cam)
    bg = jnp.ones(3)

    _binding = model.binding_device()
    _active = model.active_mask()
    _flame_param = dict(getattr(model, "flame_param", {}) or {})

    @jax.jit
    def _demand(params):
        if unbound:
            m, s, q, o, sh = world_space_gaussians(params, None, None)
        else:
            verts = model.verts_at(_flame_param, 0)
            frames = face_frames_from_verts(verts[0],
                                            model.flame_model.j_faces)
            m, s, q, o, sh = world_space_gaussians(params, _binding, frames)
        return instance_demand(
            m, s, q, o, sh, SH_DEGREE, cam, tile_size=32, active=_active)

    demand, _ = _demand(model.params)
    pipe = PipelineConfig(backend=backend,
                          capacity=autosize_capacity(int(demand)),
                          chunk=128 if backend == "pallas" else 16)

    flame_tr = model.flame_trainable() if not unbound else {}
    flame_fixed = {k: v for k, v in _flame_param.items()
                   if k not in flame_tr}
    mu, nu, count = optim.init({"gauss": model.params, "flame": flame_tr})
    state = StepState(
        params=model.params, flame_tr=flame_tr, mu=mu, nu=nu, count=count,
        max_radii2d=model.max_radii2d, grad_accum=model.xyz_gradient_accum,
        denom=model.denom,
    )
    step = make_train_step(model, opt_cfg, pipe, WIDTH, HEIGHT, SH_DEGREE,
                           1 if unbound else model.num_timesteps)
    gt = jnp.asarray(
        np.random.default_rng(2).random((3, HEIGHT, WIDTH)).astype(np.float32))
    lrs = lr_pytree(opt_cfg, 1e-3, flame_tr, model.spatial_lr_scale or 1.0)
    bindd = None if unbound else binding_arg(model)
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

    d = tempfile.mkdtemp(prefix="trace_lines_")
    try:
        with jax.profiler.trace(d):
            for i in range(iters):
                state, losses, probe = one(state, i + 1)
            jax.block_until_ready(state.params.xyz)
        analyze(d, iters)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
