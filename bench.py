#!/usr/bin/env python3
"""Canonical render benchmark (driver entry point).

Protocol mirrors the reference FPS benchmark (fps_benchmark_demo.py:53-81 /
doc/offline_render.md:115-135): 500 renders x 3 rounds at 802x550,
sh_degree 3, white background. The demo avatar blobs are absent from the
reference snapshot, so the workload is a deterministic synthetic avatar-like
cloud of 100k gaussians (matching the BASELINE.md throughput target's
configuration).

Prints ONE JSON line:
  {"metric": "render_fps_802x550_100k", "value": N, "unit": "fps",
   "vs_baseline": N}

`vs_baseline` is measured against a nominal 300 FPS CUDA-class figure for
this protocol (the reference repo publishes no numbers; 300 FPS is a
defensible mid-range estimate for a 100k-gaussian 802x550 render on the
RTX-class hardware the reference targets, doc/installation.md:3-6).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 300.0
WIDTH, HEIGHT = 802, 550
N_GAUSSIANS = 100_000
N_ITERS = 500
N_ROUNDS = 3
SH_DEGREE = 3


def make_bench_scene(n=N_GAUSSIANS, seed=0):
    """Avatar-like cloud: dense head-sized cluster filling ~half the frame."""
    rng = np.random.default_rng(seed)
    k = (SH_DEGREE + 1) ** 2
    pts = rng.normal(0.0, 0.13, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-5.2, 0.4, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0] = rng.normal(0.3, 0.5, (n, 3))
    sh[:, 1:] = rng.normal(0, 0.05, (n, k - 1, 3))
    opac = rng.uniform(0.2, 0.98, n).astype(np.float32)
    return dict(
        means3d=jnp.asarray(pts), scales=jnp.asarray(scales),
        quats=jnp.asarray(quats), opacities=jnp.asarray(opac),
        shs=jnp.asarray(sh),
    )


def main():
    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
    from tests.utils import make_camera

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    scene = make_bench_scene()
    cam = make_camera(width=WIDTH, height=HEIGHT, fovx=0.5, dist=1.0)
    bg = jnp.ones(3)

    capacity = 786_432  # live bucket (total 751839); gather/scatter are row-bound

    def raster(scene):
        return rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], SH_DEGREE, cam, bg,
            capacity=capacity, tile_size=32, chunk=128, backend=backend,
            binning_impl="dense",
        )

    @jax.jit
    def render(salt, scene):
        # the salt folds through means3d so tunneled frontends can never
        # serve repeated dispatches from a cache (verified against xplane
        # module times)
        scene = dict(scene, means3d=scene["means3d"] + salt)
        out = raster(scene)
        return out.image, out.instance_total, out.rect_overflow

    @jax.jit
    def train_like(salt, scene):
        """Forward + full backward (the BASELINE.md throughput shape)."""
        scene = dict(scene, means3d=scene["means3d"] + salt)

        def loss(scene):
            return jnp.sum(raster(scene).image)

        return jax.grad(loss)(scene)["means3d"][0, 0]

    salts = [jnp.float32(1e-7 * (i + 1)) for i in range(N_ITERS)]

    # warmup + sanity
    img, total, overflow = render(salts[0], scene)
    jax.block_until_ready(img)
    total = int(total)
    assert total <= capacity, f"instance overflow: {total} > {capacity}"
    assert int(overflow) == 0, f"dense rect-bucket overflow: {int(overflow)}"

    best_fps = 0.0
    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(N_ITERS):
            img, _, _ = render(salts[i], scene)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        best_fps = max(best_fps, N_ITERS / dt)

    result = {
        "metric": f"render_fps_{WIDTH}x{HEIGHT}_100k",
        "value": round(best_fps, 2),
        "unit": "fps",
        "vs_baseline": round(best_fps / BASELINE_FPS, 3),
    }
    print(json.dumps(result))

    # secondary metric: fwd+bwd step time (what training actually pays;
    # the CUDA-class nominal here is ~10 ms/step at this config)
    g = train_like(salts[0], scene)
    jax.block_until_ready(g)
    best_ms = float("inf")
    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(N_ITERS // 5):
            g = train_like(salts[i], scene)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / (N_ITERS // 5) * 1e3
        best_ms = min(best_ms, dt)
    print(json.dumps({
        "metric": f"fwd_bwd_ms_{WIDTH}x{HEIGHT}_100k",
        "value": round(best_ms, 2),
        "unit": "ms",
        "vs_baseline": round(10.0 / best_ms, 3),
    }))

    # tertiary: the FULL training step (render + reference loss stack
    # incl. SSIM + backward + Adam) at the same config
    from gaussianavatars_tpu.config import OptimizationConfig
    from gaussianavatars_tpu.train import optim
    from gaussianavatars_tpu.train.losses import compute_losses

    opt_cfg = OptimizationConfig()
    gt = jnp.asarray(
        np.random.default_rng(1).random((3, HEIGHT, WIDTH)).astype(np.float32))
    mu, nu, count = optim.init(scene)
    lrs = jax.tree.map(lambda _: 1e-3, scene)

    @jax.jit
    def full_step(scene, mu, nu, count):
        def loss(scene):
            out = raster(scene)
            total, _ = compute_losses(
                out.image, gt, out.visibility, scene["means3d"],
                jnp.log(scene["scales"]), None, opt_cfg, bound=False,
            )
            return total

        grads = jax.grad(loss)(scene)
        return optim.apply(scene, grads, mu, nu, count, lrs)

    scene2, mu, nu, count = full_step(scene, mu, nu, count)
    jax.block_until_ready(scene2["means3d"])
    best_ms = float("inf")
    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        s, m, n2, c = scene, mu, nu, count
        for _ in range(N_ITERS // 5):
            s, m, n2, c = full_step(s, m, n2, c)
        jax.block_until_ready(s["means3d"])
        dt = (time.perf_counter() - t0) / (N_ITERS // 5) * 1e3
        best_ms = min(best_ms, dt)
    print(json.dumps({
        "metric": f"train_step_ms_{WIDTH}x{HEIGHT}_100k",
        "value": round(best_ms, 2),
        "unit": "ms",
        "vs_baseline": round(12.0 / best_ms, 3),
    }))


if __name__ == "__main__":
    main()
