#!/usr/bin/env python3
"""Canonical render benchmark (driver entry point).

Protocol + scenes come from `gaussianavatars_tpu.benchmark` (ONE shared
module with fps_benchmark_demo.py so the driver metric and the
reference-parity CLI cannot drift): 500 renders x 3 rounds at 802x550,
sh_degree 3, white background, 100k gaussians.

Prints one JSON line per metric:
  render_fps_802x550_100k        unbound forward render (fps)
  fwd_bwd_ms_802x550_100k        unbound forward+backward (ms)
  train_step_ms_802x550_100k     unbound full train step incl. loss stack
                                 + Adam (ms)
  bound_fps_802x550_100k         FLAME-bound avatar render — LBS + binding
                                 chain every frame, the reference's actual
                                 protocol shape (fps)
  bound_step_ms_802x550_100k     FLAME-bound FULL train step (ms)

`vs_baseline` is measured against nominal CUDA-class figures for this
protocol (the reference repo publishes no numbers; 300 fps render / 10 ms
fwd+bwd / 12 ms step are defensible mid-range estimates for 100k gaussians
at 802x550 on the RTX-class hardware the reference targets,
doc/installation.md:3-6).
"""

import functools
import json
import sys

sys.path.insert(0, ".")

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.benchmark import (
    BASELINE_FPS,
    HEIGHT,
    N_GAUSSIANS,
    N_ITERS,
    N_ROUNDS,
    SH_DEGREE,
    WIDTH,
    bench_camera,
    make_bench_scene,
    make_bound_bench_model,
    run_rounds,
)

__all__ = ["make_bench_scene", "WIDTH", "HEIGHT", "SH_DEGREE", "N_GAUSSIANS"]


_LINES = []


def emit(metric, value, unit, vs_baseline, digits=2):
    """Buffer result lines; main() prints them with the canonical
    train-step metric LAST (the driver parses the final JSON line as the
    headline, and that name must stay comparable across rounds)."""
    line = json.dumps({
        "metric": metric, "value": round(value, digits), "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    })
    _LINES.append(line)


def autosize_capacity(total: int, granularity: int = 65536) -> int:
    """Round the probed live-instance demand up one bucket (the reduction's
    sorts/gathers scale with the static capacity, so headroom stays tight
    without any hardcoded magic constant)."""
    return max(1, -(-int(total) // granularity)) * granularity


def bench_unbound():
    from gaussianavatars_tpu.ops.rasterize_tiles import instance_demand, rasterize

    from gaussianavatars_tpu.benchmark import scene_flat_sh

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    # production SH layout (flat channel-major), as the train loop feeds it
    scene = scene_flat_sh(make_bench_scene())
    cam = bench_camera()
    bg = jnp.ones(3)

    # pre-size the live bucket from a capacity-free demand probe
    demand, overflow = jax.jit(functools.partial(
        instance_demand, sh_degree=SH_DEGREE, camera=cam, tile_size=32,
    ))(scene["means3d"], scene["scales"], scene["quats"],
       scene["opacities"], scene["shs"])
    assert int(overflow) == 0, f"dense rect-bucket overflow: {int(overflow)}"
    capacity = autosize_capacity(int(demand))

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

    fps = run_rounds(lambda s: render(s, scene)[0], salts)
    emit(f"render_fps_{WIDTH}x{HEIGHT}_100k", fps, "fps", fps / BASELINE_FPS)

    # secondary: fwd+bwd step time (what training actually pays; the
    # CUDA-class nominal here is ~10 ms/step at this config)
    g = train_like(salts[0], scene)
    jax.block_until_ready(g)
    ips = run_rounds(lambda s: train_like(s, scene), salts,
                     n_iter=N_ITERS // 5)
    emit(f"fwd_bwd_ms_{WIDTH}x{HEIGHT}_100k", 1e3 / ips, "ms",
         10.0 / (1e3 / ips))

    # tertiary: the FULL training step at the same config, through the SAME
    # machinery real training uses (train/loop.make_train_step: render +
    # reference loss stack incl. SSIM + backward + Adam + means2d-offset
    # densification gradient + densify-stat updates — reference
    # train.py:124-210 pays all of these every iteration; an earlier
    # version of this metric omitted the last two)
    import time

    from gaussianavatars_tpu.benchmark import scene_to_model
    from gaussianavatars_tpu.config import OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.train import optim
    from gaussianavatars_tpu.train.loop import (
        StepState, camera_arrays, lr_pytree, make_train_step,
    )

    model = scene_to_model(scene)
    opt_cfg = OptimizationConfig()
    pipe = PipelineConfig(backend=backend, capacity=capacity,
                          chunk=128 if backend == "pallas" else 16)
    model.reset_stats()
    mu, nu, count = optim.init({"gauss": model.params, "flame": {}})
    state = StepState(
        params=model.params, flame_tr={}, mu=mu, nu=nu, count=count,
        max_radii2d=model.max_radii2d, grad_accum=model.xyz_gradient_accum,
        denom=model.denom,
    )
    step = make_train_step(model, opt_cfg, pipe, WIDTH, HEIGHT, SH_DEGREE, 1)
    gt = jnp.asarray(
        np.random.default_rng(1).random((3, HEIGHT, WIDTH)).astype(np.float32))
    lrs = lr_pytree(opt_cfg, 1e-3, {}, 1.0)
    ca = camera_arrays(cam)
    # per-call salted camera (tiny numpy leaf): the only reliable
    # cache-buster for tunneled frontends (see bench_bound)
    cams_salted = [
        ca._replace(campos=np.asarray(ca.campos) + np.float32(1e-6 * (i + 1)))
        for i in range(N_ITERS // 5 + 1)
    ]

    def one(state, i):
        return step(state, {}, None, model.active_mask(), cams_salted[i],
                    gt, bg, np.int32(0), lrs)

    state, losses, probe = one(state, 0)
    jax.block_until_ready(state.params.xyz)
    assert 0 <= int(probe) <= capacity, int(probe)

    best_ips = 0.0
    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(N_ITERS // 5):
            state, losses, probe = one(state, i + 1)
        jax.block_until_ready(state.params.xyz)
        best_ips = max(best_ips,
                       (N_ITERS // 5) / (time.perf_counter() - t0))
    emit(f"train_step_ms_{WIDTH}x{HEIGHT}_100k", 1e3 / best_ips, "ms",
         12.0 / (1e3 / best_ips))


def bench_bound():
    """FLAME-bound avatar: the reference protocol's actual workload shape
    (fps_benchmark_demo.py:35-52) — every frame drives mesh -> per-face
    frames -> binding chain -> render."""
    import time

    from gaussianavatars_tpu.config import OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.train.loop import (
        StepState, binding_arg, camera_arrays, lr_pytree, make_render_fn,
        make_train_step,
    )
    from gaussianavatars_tpu.train import optim

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    model = make_bound_bench_model()
    opt_cfg = OptimizationConfig()
    cam = bench_camera()
    ca = camera_arrays(cam)
    bg = jnp.ones(3)
    n = model.n_alive

    # pre-size the live bucket from a capacity-free demand probe at the
    # bench camera/timestep (the reduction's sorts/scans scale with the
    # bucket, so headroom stays one granularity bucket, no magic constant)
    from gaussianavatars_tpu.models.flame_gaussians import (
        face_frames_from_verts,
    )
    from gaussianavatars_tpu.models.gaussians import world_space_gaussians
    from gaussianavatars_tpu.ops.rasterize_tiles import instance_demand

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

    demand, overflow = _demand(model.params)
    assert int(overflow) == 0, f"dense rect-bucket overflow: {int(overflow)}"
    pipe = PipelineConfig(backend=backend,
                          capacity=autosize_capacity(int(demand)),
                          chunk=128 if backend == "pallas" else 16)

    # ---- bound render fps ---------------------------------------------------
    render = make_render_fn(model, pipe, WIDTH, HEIGHT, SH_DEGREE)
    # constant across renders: pin on device once (numpy leaves re-upload
    # ~300 KB of FLAME params per dispatch on tunneled frontends)
    flame_param = jax.device_put(dict(model.flame_param))
    binding = binding_arg(model)
    active = model.active_mask()
    ts = jnp.asarray(0, jnp.int32)

    @jax.jit
    def salted(salt, params):
        return render(params._replace(xyz=params.xyz + salt), flame_param,
                      binding, active, ca, bg, ts)

    salts = [jnp.full((3,), 1e-7 * (i + 1), jnp.float32)
             for i in range(N_ITERS)]
    img = salted(salts[0], model.params)
    jax.block_until_ready(img)
    fps = run_rounds(lambda s: salted(s, model.params), salts)
    emit(f"bound_fps_{WIDTH}x{HEIGHT}_{n // 1000}k", fps, "fps",
         fps / BASELINE_FPS)

    # ---- bound full train step ----------------------------------------------
    flame_tr = model.flame_trainable()
    flame_fixed = jax.device_put(
        {k: v for k, v in model.flame_param.items() if k not in flame_tr})
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

    # per-call salted camera (tiny numpy leaf): evolving Adam state alone
    # is not reliably cache-proof (see full_step note in bench_unbound)
    cams_salted = [
        ca._replace(campos=np.asarray(ca.campos) + np.float32(1e-6 * (i + 1)))
        for i in range(N_ITERS // 5 + 1)
    ]

    def one(state, i):
        return step(state, flame_fixed, bindd, active, cams_salted[i], gt,
                    bg, np.int32(0), lrs)

    state, losses, probe = one(state, 0)
    jax.block_until_ready(state.params.xyz)
    assert 0 <= int(probe) <= pipe.capacity, int(probe)

    best_ips = 0.0
    for _ in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(N_ITERS // 5):
            state, losses, probe = one(state, i + 1)
        jax.block_until_ready(state.params.xyz)
        best_ips = max(best_ips,
                       (N_ITERS // 5) / (time.perf_counter() - t0))
    emit(f"bound_step_ms_{WIDTH}x{HEIGHT}_{n // 1000}k", 1e3 / best_ips,
         "ms", 12.0 / (1e3 / best_ips))


def bench_self_check():
    """On-device Mosaic-vs-jnp parity gate (VERDICT r4 weak #4): every
    BENCH_r*.json doubles as a cross-backend numeric record. Emits the
    worst image |d| and grad rel |d|; vs_baseline 1.0 = within gate."""
    sys.path.insert(0, "tools")
    from parity_vs_reference import self_check

    ok, img_d, grad_rd = self_check()
    emit("xbackend_image_maxdiff", img_d, "abs", 1.0 if ok else 0.0,
         digits=7)
    emit("xbackend_grad_reldiff", grad_rd, "rel", 1.0 if ok else 0.0,
         digits=7)


def main():
    bench_self_check()
    bench_bound()
    bench_unbound()
    # bound (avatar-workload) lines first, canonical unbound lines last
    for line in _LINES:
        print(line, flush=True)


if __name__ == "__main__":
    main()
