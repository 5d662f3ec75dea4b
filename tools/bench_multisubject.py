#!/usr/bin/env python3
"""Single-chip multi-subject training throughput (stretch config).

Interleaves S bound avatars (independent params/Adam/FLAME state, same
shapes) through ONE shared compiled train step on one chip — the
single-chip multi-tenant mode. Reports total steps/s, per-subject steps/s
and the efficiency vs a solo run (1.0 = interleaving S subjects costs
nothing beyond S times the work; the multi-CHIP subject-parallel path is
parallel/sharded.make_multisubject_train_step + dryrun_multichip).

Usage: python tools/bench_multisubject.py [--subjects 2] [--iters 60]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.benchmark import (
    HEIGHT, SH_DEGREE, WIDTH, bench_camera, make_bound_bench_model,
)
from gaussianavatars_tpu.config import OptimizationConfig, PipelineConfig
from gaussianavatars_tpu.models.flame_gaussians import face_frames_from_verts
from gaussianavatars_tpu.models.gaussians import world_space_gaussians
from gaussianavatars_tpu.ops.rasterize_tiles import instance_demand
from gaussianavatars_tpu.train import optim
from gaussianavatars_tpu.train.loop import (
    StepState, binding_arg, camera_arrays, lr_pytree, make_train_step,
)


def autosize(total, granularity=65536):
    return max(1, -(-int(total) // granularity)) * granularity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=2)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cam = bench_camera()
    ca = camera_arrays(cam)
    bg = jnp.ones(3)
    opt_cfg = OptimizationConfig()

    subjects = []
    demand_max = 0
    for s in range(args.subjects):
        model = make_bound_bench_model(seed=s)
        binding = model.binding_device()
        active = model.active_mask()
        fp = dict(model.flame_param)

        @jax.jit
        def _demand(params, model=model, binding=binding, active=active,
                    fp=fp):
            verts = model.verts_at(fp, 0)
            frames = face_frames_from_verts(verts[0],
                                            model.flame_model.j_faces)
            m, sc, q, o, sh = world_space_gaussians(params, binding, frames)
            return instance_demand(m, sc, q, o, sh, SH_DEGREE, cam,
                                   tile_size=32, active=active)

        demand, ov = _demand(model.params)
        assert int(ov) == 0
        demand_max = max(demand_max, int(demand))
        subjects.append(model)

    pipe = PipelineConfig(backend=backend, capacity=autosize(demand_max),
                          chunk=128 if backend == "pallas" else 16)

    # ONE compiled step shared by every subject (identical shapes/statics)
    step = make_train_step(subjects[0], opt_cfg, pipe, WIDTH, HEIGHT,
                           SH_DEGREE, subjects[0].num_timesteps)
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.random((3, HEIGHT, WIDTH)).astype(np.float32))

    states, binds, actives, fixeds, lrss = [], [], [], [], []
    for m in subjects:
        flame_tr = m.flame_trainable()
        mu, nu, count = optim.init({"gauss": m.params, "flame": flame_tr})
        states.append(StepState(
            params=m.params, flame_tr=flame_tr, mu=mu, nu=nu, count=count,
            max_radii2d=m.max_radii2d, grad_accum=m.xyz_gradient_accum,
            denom=m.denom,
        ))
        binds.append(binding_arg(m))
        actives.append(m.active_mask())
        fixeds.append({k: v for k, v in m.flame_param.items()
                       if k not in flame_tr})
        lrss.append(lr_pytree(opt_cfg, 1e-3, flame_tr,
                              m.spatial_lr_scale or 1.0))

    n_it = args.iters
    cams_salted = [
        ca._replace(campos=np.asarray(ca.campos) + np.float32(1e-6 * (i + 1)))
        for i in range(n_it + 1)
    ]

    def one(si, state, i):
        return step(state, fixeds[si], binds[si], actives[si],
                    cams_salted[i], gt, bg, np.int32(0), lrss[si])

    # warmup every subject through the SHARED compiled step; respond to
    # bucket shortfalls the way the training loop does (grow + rebuild)
    from gaussianavatars_tpu.train.loop import _grow_level_bucket

    for _attempt in range(8):
        probes = []
        for si in range(args.subjects):
            states[si], _, probe = one(si, states[si], 0)
            probes.append(probe)
        jax.block_until_ready(states[-1].params.xyz)
        pvs = [int(p) for p in probes]
        if any(pv < 0 for pv in pvs):
            enc = -min(pvs)
            print(f"[grow] tail level {(enc >> 24) - 1} shortfall "
                  f"{enc & ((1 << 24) - 1)}; growing bucket")
            _grow_level_bucket(pipe, enc, WIDTH, HEIGHT)
        elif max(pvs) > pipe.capacity:
            pipe.capacity = autosize(max(pvs))
            print(f"[grow] instance capacity -> {pipe.capacity}")
        else:
            break
        step = make_train_step(subjects[0], opt_cfg, pipe, WIDTH, HEIGHT,
                               SH_DEGREE, subjects[0].num_timesteps)

        def one(si, state, i, step=step):
            return step(state, fixeds[si], binds[si], actives[si],
                        cams_salted[i], gt, bg, np.int32(0), lrss[si])
    else:
        raise AssertionError(f"probe never settled: {pvs}")

    def run(active_subjects):
        best = 0.0
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for i in range(n_it):
                for si in active_subjects:
                    states[si] = one(si, states[si], i + 1)[0]
            jax.block_until_ready(states[active_subjects[-1]].params.xyz)
            dt = time.perf_counter() - t0
            best = max(best, n_it * len(active_subjects) / dt)
        return best

    solo = run([0])
    inter = run(list(range(args.subjects)))
    print(f"solo: {solo:.1f} steps/s ({1e3 / solo:.2f} ms/step)")
    print(f"{args.subjects} subjects interleaved: {inter:.1f} total steps/s "
          f"({inter / args.subjects:.1f} per subject, "
          f"{1e3 / inter:.2f} ms/step)")
    print(f"interleave efficiency: {inter / solo:.3f}")


if __name__ == "__main__":
    main()
