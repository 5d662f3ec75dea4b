#!/usr/bin/env python3
"""Op-level xplane trace of the bench forward / fwd+bwd (dev tool).

Runs the canonical bench computations under jax.profiler.trace and prints
per-op durations grouped by op family, so optimization targets are the
measured on-device costs (module totals are trustworthy; tiny-op durations
can include stalls).
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

from bench import make_bench_scene, WIDTH, HEIGHT, SH_DEGREE
from tests.utils import make_camera
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize


def summarize(trace_dir, label):
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
                if name.isdigit():      # per-step marker lines
                    continue
                ops[name] += ev.duration_ns
    print(f"==== {label} ====")
    for name, ns in ops.most_common(48):
        print(f"  {ns/1e6:9.3f} ms  {name[:120]}")


def run_and_trace(fn, args, label, iters=20):
    # vary the salt every dispatch: tunneled frontends may serve repeated
    # identical dispatches from a cache, which would undercount executions
    out = fn(jnp.float32(1e-6), *args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix=f"trace_{label}_")
    try:
        with jax.profiler.trace(d):
            for i in range(iters):
                out = fn(jnp.float32(1e-6 * (i + 1)), *args)
            jax.block_until_ready(out)
        summarize(d, f"{label} ({iters} iters; divide by {iters})")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    scene = make_bench_scene()
    cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
    bg = jnp.ones(3)
    capacity = 589_824

    def raster(scene):
        return rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], SH_DEGREE, cam, bg,
            capacity=capacity, tile_size=32, chunk=128, backend=backend,
            binning_impl="dense",
        )

    @jax.jit
    def render(salt, scene):
        scene = dict(scene, means3d=scene["means3d"] + salt)
        out = raster(scene)
        return out.image, out.instance_total, out.rect_overflow

    @jax.jit
    def train_like(salt, scene):
        scene = dict(scene, means3d=scene["means3d"] + salt)

        def loss(scene):
            return jnp.sum(raster(scene).image)

        return jax.grad(loss)(scene)["means3d"][0, 0]

    run_and_trace(render, (scene,), "fwd")
    run_and_trace(train_like, (scene,), "fwdbwd")


if __name__ == "__main__":
    main()
