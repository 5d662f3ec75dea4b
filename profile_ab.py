#!/usr/bin/env python3
"""A/B full-pipeline timings: sort vs dense binning, tile/chunk configs."""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
import jax, jax.numpy as jnp
import numpy as np
from benchlib import timeit
from bench import make_bench_scene, WIDTH, HEIGHT, SH_DEGREE
from tests.utils import make_camera
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

scene = make_bench_scene()
cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
bg = jnp.ones(3)
backend = "pallas" if jax.default_backend() == "tpu" else "jnp"


def make_fns(impl, tile, chunk, levels=None, cap=2 ** 20):
    def fwd(salt, s):
        out = rasterize(s["means3d"] + salt, s["scales"], s["quats"],
                        s["opacities"], s["shs"], SH_DEGREE, cam, bg,
                        capacity=cap, tile_size=tile, chunk=chunk,
                        backend=backend, binning_impl=impl, levels=levels)
        return out.image, out.instance_total, out.rect_overflow

    def fb(salt, s):
        def loss(s):
            out = rasterize(s["means3d"] + salt, s["scales"], s["quats"],
                            s["opacities"], s["shs"], SH_DEGREE, cam, bg,
                            capacity=cap, tile_size=tile, chunk=chunk,
                            backend=backend, binning_impl=impl, levels=levels)
            return jnp.sum(out.image)
        return jax.grad(loss)(s)["means3d"][0, 0]

    return jax.jit(fwd), jax.jit(fb)


configs = [
    ("sort  t32 c128", "sort", 32, 128, None),
    ("dense t32 c128 default", "dense", 32, 128, None),
]

for name, impl, tile, chunk, levels in configs:
    try:
        fwd, fb = make_fns(impl, tile, chunk, levels)
        img, total, ovf = fwd(jnp.float32(0), scene)
        jax.block_until_ready(img)
        print(f"{name}: total={int(total)} overflow="
              f"{int(ovf) if ovf is not None else '-'}", flush=True)
        timeit(f"{name} fwd", fwd, scene, iters=30)
        timeit(f"{name} fwd+bwd", fb, scene, iters=15)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
