#!/usr/bin/env python3
"""A/B the SH-eval share of the fwd+bwd pipeline (dev tool).

Times the canonical fwd+bwd with (a) full SH evaluation, (b)
colors_precomp short-circuiting SH entirely (upper bound on what any SH
layout/eval rework can win), and (c) a channel-major flat eval candidate.
"""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
import jax
import jax.numpy as jnp
from benchlib import timeit
from bench import make_bench_scene, WIDTH, HEIGHT, SH_DEGREE
from tests.utils import make_camera
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

scene = make_bench_scene()
cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
bg = jnp.ones(3)
backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
CAP = 589_824


def raster(s, colors_precomp=None):
    return rasterize(s["means3d"], s["scales"], s["quats"],
                     s["opacities"], s["shs"], SH_DEGREE, cam, bg,
                     capacity=CAP, tile_size=32, chunk=128,
                     backend=backend, binning_impl="dense",
                     colors_precomp=colors_precomp)


@jax.jit
def fb_sh(salt, s):
    def loss(s):
        return jnp.sum(raster(s).image)
    return jax.grad(loss)(dict(s, means3d=s["means3d"] + salt))["means3d"][0, 0]


@jax.jit
def fb_precomp(salt, s):
    def loss(s):
        cp = jnp.abs(s["shs"][:, 0, :]) * 0.3 + 0.2   # cheap, differentiable
        return jnp.sum(raster(s, colors_precomp=cp).image)
    return jax.grad(loss)(dict(s, means3d=s["means3d"] + salt))["means3d"][0, 0]


g = fb_sh(jnp.float32(1e-6), scene)
jax.block_until_ready(g)
g = fb_precomp(jnp.float32(1e-6), scene)
jax.block_until_ready(g)

timeit("fwd+bwd full SH   ", fb_sh, scene, iters=20)
timeit("fwd+bwd precomp   ", fb_precomp, scene, iters=20)
