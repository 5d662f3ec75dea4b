"""Training driver: jitted step + host-side schedule.

TPU-native re-architecture of reference train.py:35-214. One jitted
function fuses the whole hot path — FLAME drive, binding chain, tile
rasterization (Pallas), loss, backward, Adam, densification-stat update —
while the host loop owns everything event-driven: camera feeding,
densify/prune/reset (numpy surgery, every ~2k steps), eval sweeps, saving,
checkpointing. Recompilation happens only when a capacity bucket grows.

Deliberate divergences from the reference step ordering (train.py:194-210),
both consequences of fusing Adam into the jitted step:
  * the reference applies densify/reset BEFORE the optimizer step inside an
    iteration; here the jitted step applies Adam first and host surgery
    runs after. Densification reads gradient STATISTICS accumulated across
    many steps, so the one-step offset only shifts which step's stats are
    the last included — measured trajectories match the sharded/solo parity
    tests to tolerance.
  * the reference skips the optimizer step at the very last iteration
    (train.py:207-210); here the last step applies it. The saved model has
    one extra Adam update — identical in expectation, and checkpoints
    capture the matching optimizer state either way.

The screen-size prune follows the reference's LITERAL semantics by default
(max_radii2D zeroed by densification before the prune reads it, so the
test never fires — scene/gaussian_model.py:441-443 vs :505-509); set
OptimizationConfig.screen_size_prune="effective" to actually prune on
pre-densify radii (see models/gaussians.densify_and_prune).
"""

from __future__ import annotations

import functools
import json
import os
import random
import time
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    save_config,
)
from gaussianavatars_tpu.data.loader import CameraLoader, iterate_once
from gaussianavatars_tpu.data.scene import Scene
from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
from gaussianavatars_tpu.models.gaussians import (
    AdamState,
    GaussianModel,
    world_space_gaussians,
)
from gaussianavatars_tpu.ops.projection import CameraParams

GT_DEV_CACHE_BUDGET = int(float(os.environ.get(
    "GA_GT_DEVICE_CACHE_GB", "2")) * (1 << 30))  # device-resident GT images
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
from gaussianavatars_tpu.train import optim
from gaussianavatars_tpu.train.losses import compute_losses
from gaussianavatars_tpu.utils.image import psnr
from gaussianavatars_tpu.utils.schedules import expon_lr
from gaussianavatars_tpu.ops.ssim import ssim as ssim_metric
from gaussianavatars_tpu.utils.image import l1_loss as l1_metric


class CameraArrays(NamedTuple):
    """Dynamic per-view inputs (static width/height live in the jit key)."""

    viewmatrix: jnp.ndarray
    projmatrix: jnp.ndarray
    campos: jnp.ndarray
    tan_fovx: jnp.ndarray
    tan_fovy: jnp.ndarray


def camera_arrays(params: CameraParams) -> CameraArrays:
    # numpy leaves: see Camera.to_params — eager scalar device puts cost
    # an RPC round trip each on tunneled frontends
    return CameraArrays(
        viewmatrix=params.viewmatrix,
        projmatrix=params.projmatrix,
        campos=params.campos,
        tan_fovx=np.float32(params.tan_fovx),
        tan_fovy=np.float32(params.tan_fovy),
    )


def binding_arg(model):
    """Binding argument for jitted step/render fns: (binding, ends,
    seg_bound) when the sorted-binding segmented-transpose gather is
    eligible, else the plain binding array (or None unbound). All are
    valid pytree args; the jit traces per structure.

    `seg_bound` is a dummy array whose SHAPE encodes the max
    gaussians-per-face bound (pow2-rounded): jit keys on shapes, so when
    densification grows a face past the bound the step retraces with a
    wider shift-add — no stale-static hazard.
    """
    b = model.binding_device()
    if b is None:
        return None
    ends = model.binding_ends_device()
    if ends is None:
        return b
    max_seg = int(np.max(model.binding_counter)) if (
        getattr(model, "binding_counter", None) is not None) else 0
    if max_seg <= 0:
        return (b, ends)
    # floor at 16: early densification doubles the deepest face 1->2->4->8
    # in quick succession, and every pow2 bump retraces the jitted step
    # (a multi-minute remote compile each on tunneled frontends). 4 fixed
    # shift-add passes cost ~0.1 ms; three avoided recompiles buy minutes.
    p2 = max(16, 1 << max(0, (max_seg - 1)).bit_length())
    return (b, ends, np.zeros((p2,), np.int8))


def _split_binding(binding):
    if isinstance(binding, (tuple, list)):
        if len(binding) >= 3 and binding[2] is not None:
            return binding[0], binding[1], binding[2].shape[0]
        return binding[0], binding[1], None
    return binding, None, None


class StepState(NamedTuple):
    """Device-side training state threaded through the jitted step."""

    params: object            # GaussianParams
    flame_tr: dict            # trainable FLAME subset (may be empty)
    mu: object
    nu: object
    count: jnp.ndarray
    max_radii2d: jnp.ndarray
    grad_accum: jnp.ndarray
    denom: jnp.ndarray


def make_train_step(model, opt_cfg: OptimizationConfig,
                    pipe_cfg: PipelineConfig, width: int, height: int,
                    sh_degree: int, num_timesteps: int):
    """Build the jitted train step for one image resolution + capacity."""
    bound = getattr(model, "binding", None) is not None
    flame_model = getattr(model, "flame_model", None)
    levels = _dense_levels(pipe_cfg, width, height)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: StepState, flame_fixed: dict, binding, active,
             cam: CameraArrays, gt_image, bg, timestep, lrs):
        binding, binding_ends, binding_max_seg = _split_binding(binding)
        camera = CameraParams(
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=width, height=height,
        )
        capacity_n = state.params.xyz.shape[0]

        def loss_fn(params, flame_tr, means2d_offset):
            if bound:
                flame_full = {**flame_fixed, **flame_tr}
                verts, verts_cano = model.verts_at(
                    flame_full, timestep, return_verts_cano=True
                )
                from gaussianavatars_tpu.models.flame_gaussians import (
                    face_frames_from_verts,
                )

                frames = face_frames_from_verts(
                    verts[0], flame_model.j_faces
                )
            else:
                frames = None
                verts_cano = None
                flame_full = None

            means3d, scales, quats, opac, shs, face_scaling_pg = (
                world_space_gaussians(
                    params, binding if bound else None, frames,
                    binding_ends=binding_ends, return_face_scale=True,
                    binding_max_seg=binding_max_seg,
                ))
            out = rasterize(
                means3d, scales, quats, opac, shs, sh_degree, camera, bg,
                capacity=pipe_cfg.capacity,
                tile_size=pipe_cfg.tile_size,
                chunk=pipe_cfg.chunk,
                backend=pipe_cfg.backend,
                binning_impl=getattr(pipe_cfg, "binning", "dense"),
                levels=levels,
                means2d_offset=means2d_offset,
                active=active,
            )
            image = out.image

            total, losses = compute_losses(
                image, gt_image, out.visibility, params.xyz, params.scaling,
                face_scaling_pg, opt_cfg, bound,
            )
            if bound:
                if opt_cfg.lambda_dynamic_offset != 0.0:
                    losses["dy_off"] = model.compute_dynamic_offset_loss(
                        flame_full, timestep
                    ) * opt_cfg.lambda_dynamic_offset
                    total = total + losses["dy_off"]
                if opt_cfg.lambda_dynamic_offset_std != 0.0:
                    std = flame_full["dynamic_offset"].std(axis=0).mean()
                    losses["dynamic_offset_std"] = (
                        std * opt_cfg.lambda_dynamic_offset_std
                    )
                    total = total + losses["dynamic_offset_std"]
                if opt_cfg.lambda_laplacian != 0.0:
                    losses["lap"] = model.compute_laplacian_loss(
                        flame_full, timestep, verts_cano
                    ) * opt_cfg.lambda_laplacian
                    total = total + losses["lap"]
            losses["total"] = total
            probe = out.instance_total
            if out.rect_overflow is not None:
                # fold the dense rect-bucket probe into the same scalar
                # (negative => bucket shortfall; host grows levels)
                probe = jnp.where(
                    out.rect_overflow > 0, -out.rect_overflow, probe
                )
            aux = (losses, out.radii, out.visibility, probe)
            return total, aux

        zeros_off = jnp.zeros((capacity_n, 2), jnp.float32)
        grads, aux = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, state.flame_tr, zeros_off)
        g_params, g_flame, g_means2d = grads
        losses, radii, visibility, instance_total = aux

        # one Adam step over the combined pytree
        combined = {"gauss": state.params, "flame": state.flame_tr}
        combined_g = {"gauss": g_params, "flame": g_flame}
        new_p, new_mu, new_nu, new_count = optim.apply(
            combined, combined_g, state.mu, state.nu, state.count, lrs
        )

        # densification statistics (reference train.py:196-198)
        vis = visibility
        grad_norm = jnp.linalg.norm(g_means2d, axis=-1)
        grad_accum = state.grad_accum + jnp.where(vis, grad_norm, 0.0)
        denom = state.denom + vis.astype(jnp.float32)
        max_radii = jnp.maximum(
            state.max_radii2d, jnp.where(vis, radii.astype(jnp.float32), 0.0)
        )

        new_state = StepState(
            params=new_p["gauss"], flame_tr=new_p["flame"],
            mu=new_mu, nu=new_nu, count=new_count,
            max_radii2d=max_radii, grad_accum=grad_accum, denom=denom,
        )
        return new_state, losses, instance_total

    return step


def _dense_levels(pipe_cfg, width, height):
    """Dense level plan for this resolution, scaled by the grow knob."""
    if getattr(pipe_cfg, "binning", "dense") != "dense":
        return None
    from gaussianavatars_tpu.ops.binning import tile_grid
    from gaussianavatars_tpu.ops.binning_dense import scaled_levels

    ntx, nty = tile_grid(width, height, pipe_cfg.tile_size)
    return scaled_levels(ntx, nty, getattr(pipe_cfg, "level_scale", 1),
                         getattr(pipe_cfg, "level_scales", ()))


def _grow_level_bucket(pipe_cfg, enc, width, height):
    """Grow ONLY the overflowing tail bucket, directly to the observed
    need (pow2 with 25% headroom): rect_overflow encodes
    (bucket_level+1) << 24 | shortfall. One recompile instead of repeated
    global doublings — and no collateral slot-count inflation on the
    other levels (every sort/key-build cost scales with total slots).

    Returns True if a bucket actually grew (caller must rebuild step fns
    AND discard in-flight pre-growth probes; a stale probe re-triggering
    growth would double the just-grown bucket again). Returns False when
    the bucket is already at the 1 << RANK_BITS per-level ceiling —
    growing further is impossible and re-jitting would loop forever."""
    from gaussianavatars_tpu.ops.binning import tile_grid
    from gaussianavatars_tpu.ops.binning_dense import RANK_BITS, default_levels

    lvl = (enc >> 24) - 1
    short = enc & ((1 << 24) - 1)
    scales = list(getattr(pipe_cfg, "level_scales", ()) or ())
    if lvl < 0:                      # un-tagged legacy probe
        pipe_cfg.level_scale = 2 * getattr(pipe_cfg, "level_scale", 1)
        return True
    ntx, nty = tile_grid(width, height, pipe_cfg.tile_size)
    buckets = [b for _, _, b in default_levels(ntx, nty) if b is not None]
    while len(scales) < len(buckets):
        scales.append(1)
    base = buckets[lvl] * getattr(pipe_cfg, "level_scale", 1)
    if base * scales[lvl] >= (1 << RANK_BITS):
        print(f"[warn] tail level {lvl} bucket already at the "
              f"{1 << RANK_BITS} rank-field ceiling; cannot grow further "
              f"(shortfall {short} instances will keep being dropped "
              "depth-last)")
        return False
    cur = base * scales[lvl]
    need = int(1.25 * (cur + short))
    mult = -(-need // base)
    scales[lvl] = max(scales[lvl] * 2,
                      1 << max(0, (mult - 1)).bit_length())
    pipe_cfg.level_scales = tuple(scales)
    return True


def make_parallel_train_step(mesh, model, opt_cfg: OptimizationConfig,
                             pipe_cfg: PipelineConfig, width: int,
                             height: int, sh_degree: int):
    """StepState-shaped adapter around parallel.sharded.make_sharded_train_step.

    Presents the same (state, ...) -> (state, losses, instance_total)
    contract as `make_train_step`, with a camera BATCH (leading dim =
    mesh 'data' axis) instead of a single camera. Gaussian params / Adam
    moments / densify stats shard over 'prim'; FLAME state replicates.
    Host-side surgery (densify/prune/reset) keeps working unchanged: the
    jitted step re-shards fresh host arrays on entry.
    """
    from gaussianavatars_tpu.parallel.sharded import make_sharded_train_step

    raw = make_sharded_train_step(
        mesh, model, opt_cfg, pipe_cfg, width, height, sh_degree,
    )

    def step(state: StepState, flame_fixed: dict, binding, active,
             cam_batch: CameraArrays, gt_batch, bg_batch, timestep_batch,
             lrs):
        # the sharded step shards the gaussian axis; the cumsum-transpose
        # gather is shard-incoherent there, so drop any (binding, ends)
        # tuple down to the plain binding array
        binding, _, _ = _split_binding(binding)
        out = raw(
            state.params, state.flame_tr, flame_fixed, binding, active,
            cam_batch, gt_batch, bg_batch, timestep_batch, lrs,
            state.mu["gauss"], state.nu["gauss"],
            state.mu["flame"], state.nu["flame"], state.count,
            state.max_radii2d, state.grad_accum, state.denom,
        )
        (params, flame_tr, mu_g, nu_g, mu_f, nu_f, count,
         max_radii, accum, denom, losses, total_inst) = out
        new_state = StepState(
            params=params, flame_tr=flame_tr,
            mu={"gauss": mu_g, "flame": mu_f},
            nu={"gauss": nu_g, "flame": nu_f},
            count=count, max_radii2d=max_radii,
            grad_accum=accum, denom=denom,
        )
        return new_state, losses, total_inst

    return step


def make_render_fn(model, pipe_cfg: PipelineConfig, width: int, height: int,
                   sh_degree: int):
    """Jitted inference render (used by eval sweeps and offline render)."""
    bound = getattr(model, "binding", None) is not None

    @jax.jit
    def render(params, flame_param: dict, binding, active,
               cam: CameraArrays, bg, timestep):
        binding, binding_ends, binding_max_seg = _split_binding(binding)
        camera = CameraParams(
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=width, height=height,
        )
        if bound:
            frames = model.face_frames_at(flame_param, timestep)
        else:
            frames = None
        means3d, scales, quats, opac, shs = world_space_gaussians(
            params, binding if bound else None, frames,
            binding_ends=binding_ends, binding_max_seg=binding_max_seg,
        )
        # debug pipeline flags (reference gaussian_renderer/__init__.py:63-81):
        # precompute covariance / SH colors outside the rasterizer core
        colors_precomp = None
        cov3d_precomp = None
        if pipe_cfg.convert_SHs_python:
            from gaussianavatars_tpu.ops.sh import eval_sh

            dirs = means3d - camera.campos
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
            # flat channel-major [C, 3*K] -> [C, 3, K] (eval_sh wants the
            # channel axis at -2, which IS the c-major block axis)
            shs3 = shs.reshape(shs.shape[0], 3, -1)
            colors_precomp = jnp.maximum(
                eval_sh(sh_degree, shs3, dirs) + 0.5, 0.0)
        if pipe_cfg.compute_cov3D_python:
            from gaussianavatars_tpu.ops.covariance import build_covariance_3d

            cov3d_precomp = build_covariance_3d(scales, quats)
        common = dict(
            capacity=pipe_cfg.capacity, tile_size=pipe_cfg.tile_size,
            chunk=pipe_cfg.chunk, backend=pipe_cfg.backend,
            binning_impl=getattr(pipe_cfg, "binning", "dense"),
            active=active,
            colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        )
        slab_rows = getattr(pipe_cfg, "slab_tile_rows", 0)
        if not slab_rows:
            out = rasterize(
                means3d, scales, quats, opac, shs, sh_degree, camera, bg,
                levels=_dense_levels(pipe_cfg, width, height), **common,
            )
            return out.image
        # tile-row windows: one projection, S sequential slab rasterizations
        # (single-chip high-resolution path — at 4K the full tile grid
        # exceeds the kernels' scalar-prefetch SMEM budget in one pass)
        from gaussianavatars_tpu.ops.binning import tile_grid
        from gaussianavatars_tpu.ops.projection import project_gaussians

        proj = project_gaussians(
            means3d, scales, quats, opac, shs, sh_degree, camera,
            colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        )
        _, nty = tile_grid(width, height, pipe_cfg.tile_size)
        slabs = []
        for s0 in range(0, nty, slab_rows):
            rows = min(slab_rows, nty - s0)
            out = rasterize(
                means3d, scales, quats, opac, shs, sh_degree, camera, bg,
                projected=proj, tile_row_start=s0, tile_rows=rows, **common,
            )
            slabs.append(out.image)
        return jnp.concatenate(slabs, axis=1)[:, :height]

    return render


# ----------------------------------------------------------------------------
# Host-side driver
# ----------------------------------------------------------------------------

def lr_pytree(opt_cfg: OptimizationConfig, xyz_lr: float, flame_tr: dict,
              spatial_lr_scale: float):
    from gaussianavatars_tpu.models.gaussians import GaussianParams

    gauss = GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
    )
    flame_lrs = {}
    for k in flame_tr:
        if k in ("rotation", "neck_pose", "jaw_pose", "eyes_pose"):
            flame_lrs[k] = opt_cfg.flame_pose_lr
        elif k == "translation":
            flame_lrs[k] = opt_cfg.flame_trans_lr
        elif k == "expr":
            flame_lrs[k] = opt_cfg.flame_expr_lr
    return {"gauss": gauss, "flame": flame_lrs}


def gui_poll(gui, model, state: StepState, flame_fixed, pipe_cfg,
             iteration: int, total_iterations: int,
             render_fns: dict) -> None:
    """Network-GUI polling (reference train.py:62-102): serve interactive
    view requests between optimization steps; wire-compatible with the
    reference remote viewer."""
    import jax.numpy as jnp

    if gui.conn is None:
        gui.try_connect()
    bound = getattr(model, "binding", None) is not None
    while gui.conn is not None:
        try:
            cam, msg = gui.receive()
            if cam is not None:
                p = cam.to_params()
                key = ("gui", p.width, p.height, model.capacity,
                       model.active_sh_degree)
                if key not in render_fns:
                    render_fns[key] = make_render_fn(
                        model, pipe_cfg, p.width, p.height,
                        model.active_sh_degree,
                    )
                flame_full = (
                    {**flame_fixed, **state.flame_tr} if bound else {}
                )
                if bound and msg.get("use_original_mesh") and \
                        model.flame_param_orig is not None:
                    flame_full = {
                        k: jnp.asarray(v)
                        for k, v in model.flame_param_orig.items()
                    }
                net_image = None
                if msg.get("show_splatting", True):
                    net_image = render_fns[key](
                        state.params, flame_full,
                        binding_arg(model) if bound else None,
                        model.active_mask(), camera_arrays(p),
                        jnp.ones(3, jnp.float32),
                        jnp.asarray(cam.timestep, jnp.int32),
                    )
                    net_image = np.asarray(jnp.clip(net_image, 0.0, 1.0))
                if bound and msg.get("show_mesh"):
                    from gaussianavatars_tpu.render.mesh_renderer import (
                        rasterize_mesh,
                    )

                    verts = model.verts_at(flame_full, int(cam.timestep))
                    rgb, alpha, _, _ = rasterize_mesh(
                        np.asarray(verts[0]), model.flame_model.faces, p)
                    rgb = np.asarray(rgb).transpose(2, 0, 1)
                    alpha = np.asarray(alpha)[None]
                    op = float(msg.get("mesh_opacity", 0.5))
                    if net_image is None:
                        net_image = rgb
                    else:
                        net_image = (
                            rgb * alpha * op
                            + net_image * (alpha * (1 - op) + (1 - alpha))
                        )
                gui.send(net_image, {
                    "num_timesteps": model.num_timesteps,
                    "num_points": model.n_alive,
                })
            if msg["do_training"] and (
                iteration < total_iterations or not msg["keep_alive"]
            ):
                break
        except Exception as e:
            # The reference swallows these silently (train.py:100-102);
            # log first so a render-path bug doesn't masquerade as a
            # viewer disconnect.
            print(f"[gui] dropping viewer connection after error: {e!r}")
            gui.drop()


def training(model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
             pipe_cfg: PipelineConfig, testing_iterations=(),
             saving_iterations=(), checkpoint_iterations=(),
             start_checkpoint: Optional[str] = None,
             log_every: int = 10,
             tb_writer=None, gui=None, debug_from: int = -1,
             seed: int = 0):
    """Full optimization loop (reference train.py:35-214)."""
    os.makedirs(model_cfg.model_path, exist_ok=True)
    save_config(model_cfg.model_path, model_cfg)

    # reference safe_state (utils/general_utils.py:112-133): seed the
    # process RNGs at training entry so the run is reproducible no matter
    # what the host process did before (camera shuffle order uses the
    # global `random` module, scene.py:79)
    random.seed(seed)
    np.random.seed(seed)

    # device mesh for --data_parallel / --render_parallel (SURVEY.md §2.5)
    n_data = max(1, pipe_cfg.data_parallel)
    n_prim = max(1, pipe_cfg.render_parallel)
    parallel = n_data * n_prim > 1
    mesh = None
    if parallel:
        from gaussianavatars_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=n_data, n_prim=n_prim)

    if model_cfg.bind_to_mesh:
        model = FlameGaussianModel(
            model_cfg.sh_degree,
            model_cfg.disable_flame_static_offset,
            model_cfg.not_finetune_flame_params,
        )
    else:
        model = GaussianModel(model_cfg.sh_degree)
    if parallel:
        # capacity buckets must divide evenly across the prim shards
        g = model.capacity_granularity
        model.capacity_granularity = g * n_prim // __import__("math").gcd(
            g, n_prim
        )

    scene = Scene(model_cfg, model)
    bound = getattr(model, "binding", None) is not None

    first_iter = 0
    flame_tr = model.flame_trainable() if bound else {}
    combined = {"gauss": model.params, "flame": flame_tr}
    mu, nu, count = optim.init(combined)

    if start_checkpoint:
        data = dict(np.load(start_checkpoint, allow_pickle=True))
        first_iter = int(data.pop("iteration"))
        state_g = model.restore(
            {k[2:]: v for k, v in data.items() if k.startswith("g_")}
        )
        flame_tr = {
            k[2:]: jnp.asarray(v) for k, v in data.items()
            if k.startswith("f_")
        }
        if bound:
            model.merge_flame_trainable(flame_tr)
        combined = {"gauss": model.params, "flame": flame_tr}
        mu = {"gauss": state_g.mu, "flame": jax.tree.map(jnp.zeros_like, flame_tr)}
        nu = {"gauss": state_g.nu, "flame": jax.tree.map(jnp.zeros_like, flame_tr)}
        count = state_g.count

    flame_fixed = (
        {k: v for k, v in model.flame_param.items() if k not in flame_tr}
        if bound else {}
    )
    # constant across steps: pin on device ONCE. As numpy leaves these
    # re-upload every dispatch (static_offset alone is 60 KB; tunneled
    # frontends pay arg-transfer per step) — same class of win as the GT
    # device cache above.
    flame_fixed = jax.device_put(flame_fixed)
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0]
    )

    loader = CameraLoader(
        scene.get_train_cameras(), resolution_arg=model_cfg.resolution
    )

    step_fns = {}
    state = StepState(
        params=model.params, flame_tr=flame_tr, mu=mu, nu=nu,
        count=count,
        max_radii2d=model.max_radii2d,
        grad_accum=model.xyz_gradient_accum,
        denom=model.denom,
    )

    ema_loss = None   # seeded to the first observed loss (an EMA from 0
                      # understates early history points by up to 60%,
                      # which poisons any learned-vs-initial comparison)
    t_start = time.time()
    history = []
    timeline = []
    # end-of-run observability: growth/rejit/surgery event counts land in
    # run_summary.json next to cfg_args (warnings alone scroll away)
    events = {"capacity_growth": 0, "level_bucket_growth": 0,
              "densify": 0, "opacity_reset": 0, "unresolved_overflow": 0,
              "step_compiles": 0}
    compile_s = 0.0  # wall time stalled in trace+compile (see t_disp)
    last_probe = 0  # most recent drained instance-demand probe
    # 2-deep probe/loss read pipeline: by the time an entry is read, its
    # async D2H copy has fully landed, so the read never pays the tunnel
    # round trip (reading 1 step late still stalls ~1 RTT after the step)
    from collections import deque
    pending = deque()
    stale_probes = 0   # probes enqueued before a bucket growth: ignored
    gt_dev_cache = {}  # (image key, w, h) -> device-resident GT image
    gt_dev_bytes = [0]

    # ---- speculative async pre-compilation -------------------------------
    # Remote/AOT TPU compilers can take minutes per fresh HLO; the 10k
    # 448x400 quality run measured compile_frac 0.53 with only 5 step
    # compiles. SH warmup bumps are PREDICTABLE (every 1000 iterations,
    # reference train.py:109-110), so the next degree's step fn is traced
    # + compiled on a side thread ~300 iters ahead: by bump time the
    # persistent compile cache (utils/jax_setup) already holds the
    # executable and the foreground "compile" is a cache read.
    import threading

    precompiling = set()
    last_step_args = {}            # jit key -> concrete args of last call
    cfg_gen = [0]                  # bumped whenever pipe_cfg mutates
                                   # (level/capacity growth): an in-flight
                                   # precompile traced against the OLD plan
                                   # must not re-install itself after the
                                   # growth's step_fns.clear()

    def precompile_async(key, builder, args):
        if parallel or key in step_fns or key in precompiling:
            return
        precompiling.add(key)
        gen = cfg_gen[0]

        def run():
            try:
                fn = builder()
                fn.lower(*args).compile()
                if cfg_gen[0] == gen:
                    step_fns.setdefault(key, fn)
            except Exception as e:     # stale shapes etc. — speculative
                print(f"[warn] async precompile {key}: {e!r}")
            finally:
                precompiling.discard(key)

        threading.Thread(target=run, daemon=True).start()

    from tqdm import tqdm

    progress = tqdm(range(first_iter, opt_cfg.iterations),
                    desc="Training progress")

    for iteration in range(first_iter + 1, opt_cfg.iterations + 1):
        if gui is not None:
            gui_poll(gui, model, state, flame_fixed, pipe_cfg,
                     iteration, opt_cfg.iterations, step_fns)

        # reference --debug_from (train.py:215): arm the non-finite
        # snapshot dump from this iteration on
        if debug_from >= 0 and iteration >= debug_from:
            pipe_cfg.debug = True

        # xyz LR schedule (reference train.py:106)
        xyz_lr = float(expon_lr(
            iteration, opt_cfg.position_lr_init * model.spatial_lr_scale,
            opt_cfg.position_lr_final * model.spatial_lr_scale,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps,
        ))

        # SH warmup (reference train.py:109-110)
        if iteration % 1000 == 0:
            model.one_up_sh_degree()

        # the NEXT warmup degree's step fn compiles on a side thread ~300
        # iters ahead of its bump (arg shapes are degree-independent)
        if (not parallel and iteration % 1000 == 700
                and model.active_sh_degree < model.max_sh_degree):
            nxt_deg = model.active_sh_degree + 1
            wh = (params_cam.width, params_cam.height)
            if wh in last_step_args:
                w_, h_ = wh
                cap_ = model.capacity
                precompile_async(
                    (w_, h_, cap_, nxt_deg),
                    lambda w_=w_, h_=h_, nxt_deg=nxt_deg: make_train_step(
                        model, opt_cfg, pipe_cfg, w_, h_, nxt_deg,
                        model.num_timesteps),
                    last_step_args[wh])

        if parallel:
            # one optimizer step consumes a data-axis batch of cameras
            views = [next(loader) for _ in range(n_data)]
            plist = [c.to_params(*c.resolution(model_cfg.resolution))
                     for c, _ in views]
            sizes = {(p.width, p.height) for p in plist}
            assert len(sizes) == 1, (
                f"data-parallel batches need uniform resolution, got {sizes}"
            )
            params_cam = plist[0]
            cam = views[0][0]
        else:
            cam, gt = next(loader)
            params_cam = cam.to_params(*cam.resolution(model_cfg.resolution))
        key = (params_cam.width, params_cam.height, model.capacity,
               model.active_sh_degree)
        if key not in step_fns:
            if parallel:
                step_fns[key] = make_parallel_train_step(
                    mesh, model, opt_cfg, pipe_cfg, params_cam.width,
                    params_cam.height, model.active_sh_degree,
                )
            else:
                step_fns[key] = make_train_step(
                    model, opt_cfg, pipe_cfg, params_cam.width,
                    params_cam.height, model.active_sh_degree,
                    model.num_timesteps,
                )
            events["step_compiles"] += 1
        lrs = lr_pytree(opt_cfg, xyz_lr, state.flame_tr, model.spatial_lr_scale)

        if parallel:
            cam_batch = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[camera_arrays(p) for p in plist],
            )
            gt_batch = np.stack([np.asarray(g, np.float32) for _, g in views])
            bg_batch = np.stack(
                [np.asarray(c.bg, np.float32) for c, _ in views])
            ts_batch = np.asarray(
                [c.timestep or 0 for c, _ in views], np.int32)
            state, losses, instance_total = step_fns[key](
                state, flame_fixed,
                binding_arg(model) if bound else None,
                model.active_mask(), cam_batch, gt_batch, bg_batch,
                ts_batch, lrs,
            )
        else:
            timestep = np.int32(cam.timestep or 0)
            cam_bg = np.asarray(cam.bg, np.float32)

            # Device-resident GT image cache: the per-step host->device
            # upload of the GT (e.g. 2.1 MB at 448x400) dominates the step
            # on tunneled TPU frontends (~tens of ms of arg transfer; the
            # 10k quality run measured ~12 steps/s where the jitted step
            # costs ~10 ms). Datasets are epoch-cyclic, so each view
            # uploads once and later steps pass the device handle.
            gt_arg = None
            ck = (cam.image_path or (cam.camera_id, cam.timestep),
                  params_cam.width, params_cam.height)
            gt_arg = gt_dev_cache.get(ck)
            if gt_arg is None:
                gt_arg = np.asarray(gt, np.float32)
                if gt_dev_bytes[0] + gt_arg.nbytes <= GT_DEV_CACHE_BUDGET:
                    gt_arg = jax.device_put(gt_arg)
                    gt_dev_cache[ck] = gt_arg
                    gt_dev_bytes[0] += 3 * 4 * params_cam.width \
                        * params_cam.height

            step_args = (
                state, flame_fixed, binding_arg(model) if bound else None,
                model.active_mask(),
                camera_arrays(params_cam), gt_arg, cam_bg,
                timestep, lrs,
            )
            # stash SHAPES only (the real call donates state's buffers;
            # holding concrete refs would pin or invalidate them)
            last_step_args[key[:2]] = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                if hasattr(a, "shape") else a, step_args)
            t_disp = time.time()
            state, losses, instance_total = step_fns[key](*step_args)
            t_disp = time.time() - t_disp
            if t_disp > 0.5:
                # dispatch is async; a stalled CALL is a trace+compile
                # (fresh jitted fn, or an in-fn retrace from a shape
                # change, e.g. the binding seg_bound growing)
                compile_s += t_disp

        # Probes and losses are checked EVERY iteration but one step late,
        # via async D2H copies started at dispatch time: a synchronous
        # device_get costs a full host<->device round trip (~30-100 ms on
        # tunneled TPU frontends) even for materialized scalars, while a
        # pipelined copy has already landed by the next iteration.
        instance_total.copy_to_host_async()
        for v in losses.values():
            v.copy_to_host_async()
        pending.append((instance_total, losses))
        pv = None
        if len(pending) > 2 or iteration == opt_cfg.iterations:
            pv = int(pending.popleft()[0])
            if stale_probes > 0:
                # probe predates a bucket/capacity growth this drain
                # already acted on — using it would double the grown
                # bucket again (one wasted recompile + slot inflation)
                stale_probes -= 1
                pv = None
        if pv is not None:
            if pv >= 0:
                last_probe = max(last_probe, pv)
            if pv < 0:
                enc = -pv
                print(f"[warn] dense level-bucket shortfall "
                      f"{enc & ((1 << 24) - 1)} on tail level "
                      f"{(enc >> 24) - 1}; growing that bucket")
                if _grow_level_bucket(pipe_cfg, enc, params_cam.width,
                                      params_cam.height):
                    events["level_bucket_growth"] += 1
                    step_fns.clear()
                    cfg_gen[0] += 1
                    stale_probes = len(pending)
            elif pv > pipe_cfg.capacity:
                print(f"[warn] instance overflow {pv} > "
                      f"{pipe_cfg.capacity}; growing bucket")
                pipe_cfg.capacity = int(1.5 * pv)
                events["capacity_growth"] += 1
                step_fns.clear()
                cfg_gen[0] += 1
                stale_probes = len(pending)
        if iteration % log_every == 0 or iteration == opt_cfg.iterations:
            # final iteration reads its own losses (sync); otherwise the
            # oldest pipelined copy keeps logging stall-free
            src_losses = (losses if iteration == opt_cfg.iterations
                          or not pending else pending[0][1])
            total = float(src_losses["total"])
            if pipe_cfg.debug and not np.isfinite(total):
                # reference --debug_from/debug snapshot analog
                # (gaussian_renderer/__init__.py:49): dump state for
                # post-mortem instead of crashing blind
                snap = os.path.join(
                    model_cfg.model_path, f"snapshot_fw_{iteration}.npz")
                save_checkpoint(model, state, iteration, snap)
                raise FloatingPointError(
                    f"non-finite loss at iteration {iteration}; "
                    f"state dumped to {snap}")
            ema_loss = (total if ema_loss is None
                        else 0.4 * total + 0.6 * ema_loss)
            history.append((iteration, ema_loss))
            timeline.append((iteration, time.time()))
            progress.set_postfix({"Loss": f"{ema_loss:.7f}"})
            progress.update(min(log_every, opt_cfg.iterations - progress.n))
            if tb_writer is not None:
                for k, v in src_losses.items():
                    tb_writer.add_scalar(
                        f"train_loss_patches/{k}_loss", float(v), iteration
                    )
                tb_writer.add_scalar("total_points", model.n_alive, iteration)

        # write back for host-side surgery steps
        model.params = state.params
        model.max_radii2d = state.max_radii2d
        model.xyz_gradient_accum = state.grad_accum
        model.denom = state.denom
        if bound:
            model.merge_flame_trainable(state.flame_tr)

        if iteration in saving_iterations:
            scene.save(iteration)

        # densification (reference train.py:194-205)
        if iteration < opt_cfg.densify_until_iter:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                size_threshold = (
                    20 if iteration > opt_cfg.opacity_reset_interval else None
                )
                face_scaling = None
                if bound:
                    frames = model.face_frames_at(
                        model.flame_param, int(cam.timestep or 0)
                    )
                    face_scaling = np.asarray(frames.scaling)
                adam_g = AdamState(
                    mu=state.mu["gauss"], nu=state.nu["gauss"],
                    count=state.count,
                )
                n_before = max(model.n_alive, 1)
                adam_g = model.densify_and_prune(
                    adam_g, opt_cfg.densify_grad_threshold, 0.005,
                    scene.cameras_extent, size_threshold,
                    opt_cfg.percent_dense, face_scaling,
                    seed=iteration,
                    screen_size_prune=opt_cfg.screen_size_prune,
                )
                events["densify"] += 1
                # probe-based instance-capacity PRE-sizing: scale the last
                # demand probe by the gaussian growth ratio and grow the
                # bucket BEFORE compiling the new step, instead of paying
                # an overflow step + a second recompile after it
                if last_probe:
                    est = int(last_probe * (model.n_alive / n_before) * 1.15)
                    if est > pipe_cfg.capacity:
                        pipe_cfg.capacity = -(-est // 65536) * 65536
                        events["capacity_growth"] += 1
                state = StepState(
                    params=model.params, flame_tr=state.flame_tr,
                    mu={"gauss": adam_g.mu, "flame": state.mu["flame"]},
                    nu={"gauss": adam_g.nu, "flame": state.nu["flame"]},
                    count=state.count,
                    max_radii2d=model.max_radii2d,
                    grad_accum=model.xyz_gradient_accum,
                    denom=model.denom,
                )
                # NO step_fns.clear(): the step key carries model.capacity,
                # so surgery that stays inside the bucket reuses the
                # compiled step; only pipe_cfg changes (instance capacity /
                # level growth) invalidate entries wholesale

                # predictive capacity-bucket precompile: when the live
                # count nears the bucket, the NEXT bucket's step config is
                # known — compile it on the side thread now so the growth
                # retrace is a persistent-cache read (the 30k protocol run
                # measured ~100-150 s per fresh capacity HLO, the largest
                # remaining compile_frac class after the SH-warmup fix)
                if not parallel and model.n_alive >= 0.8 * model.capacity:
                    old_cap = model.capacity
                    nxt_cap = old_cap + model.capacity_granularity
                    wh = (params_cam.width, params_cam.height)
                    if wh in last_step_args:
                        def morph(s):
                            if (hasattr(s, "shape") and s.shape
                                    and s.shape[0] == old_cap):
                                return jax.ShapeDtypeStruct(
                                    (nxt_cap,) + s.shape[1:], s.dtype)
                            return s
                        deg = model.active_sh_degree
                        w_, h_ = wh
                        precompile_async(
                            (w_, h_, nxt_cap, deg),
                            lambda w_=w_, h_=h_, deg=deg: make_train_step(
                                model, opt_cfg, pipe_cfg, w_, h_, deg,
                                model.num_timesteps),
                            jax.tree.map(morph, last_step_args[wh]))

            if iteration % opt_cfg.opacity_reset_interval == 0 or (
                model_cfg.white_background
                and iteration == opt_cfg.densify_from_iter
            ):
                adam_g = AdamState(
                    mu=state.mu["gauss"], nu=state.nu["gauss"],
                    count=state.count,
                )
                adam_g = model.reset_opacity(adam_g)
                events["opacity_reset"] += 1
                state = state._replace(
                    params=model.params,
                    mu={"gauss": adam_g.mu, "flame": state.mu["flame"]},
                    nu={"gauss": adam_g.nu, "flame": state.nu["flame"]},
                )

        if iteration in testing_iterations:
            metrics = evaluate_splits(
                model, scene, model_cfg, pipe_cfg, state, flame_fixed, bg,
                tb_writer=tb_writer, iteration=iteration,
            )
            for split, m in metrics.items():
                print(f"[ITER {iteration}] Evaluating {split}: "
                      + " ".join(f"{k} {v:.4f}" for k, v in m.items()))
                if tb_writer is not None:
                    for k, v in m.items():
                        tb_writer.add_scalar(
                            f"{split}/loss_viewpoint - {k}", v, iteration
                        )
            if tb_writer is not None:
                opac = np.asarray(
                    jax.nn.sigmoid(state.params.opacity[:model.n_alive, 0])
                )
                tb_writer.add_histogram(
                    "scene/opacity_histogram", opac, iteration)

        if iteration in checkpoint_iterations:
            save_checkpoint(
                model, state, iteration,
                os.path.join(model_cfg.model_path, f"chkpnt{iteration}.npz"),
            )

    # drain unchecked overflow probes from the pipeline tail (growth can't
    # help a finished run, but silent truncation must never be silent)
    while pending:
        pv = int(pending.popleft()[0])
        if pv < 0:
            print(f"[warn] dense level-bucket shortfall "
                  f"{(-pv) & ((1 << 24) - 1)} on tail level "
                  f"{((-pv) >> 24) - 1} in final steps")
            events["unresolved_overflow"] += 1
        elif pv > pipe_cfg.capacity:
            print(f"[warn] instance overflow {pv} > {pipe_cfg.capacity} "
                  "in final steps")
            events["unresolved_overflow"] += 1

    progress.close()
    loader.stop()
    elapsed = time.time() - t_start
    summary = {
        "iterations": int(opt_cfg.iterations),
        "first_iter": int(first_iter),
        "elapsed_s": round(elapsed, 2),
        "final_ema_loss": float(ema_loss or 0.0),
        "n_alive": int(model.n_alive),
        "model_capacity": int(model.capacity),
        "instance_capacity": int(pipe_cfg.capacity),
        "level_scale": int(getattr(pipe_cfg, "level_scale", 1)),
        "level_scales": list(getattr(pipe_cfg, "level_scales", ()) or ()),
        "compile_s": round(compile_s, 2),
        "compile_frac": round(compile_s / max(elapsed, 1e-9), 4),
        "events": events,
    }
    with open(os.path.join(model_cfg.model_path, "run_summary.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    return model, state, {"ema_loss": ema_loss or 0.0, "elapsed": elapsed,
                          "history": history, "timeline": timeline,
                          "summary": summary}


def save_checkpoint(model, state: StepState, iteration: int, path: str):
    adam_g = AdamState(mu=state.mu["gauss"], nu=state.nu["gauss"],
                       count=state.count)
    data = {f"g_{k}": v for k, v in model.capture(adam_g).items()}
    for k, v in state.flame_tr.items():
        data[f"f_{k}"] = np.asarray(v)
    data["iteration"] = iteration
    np.savez(path, **data)


_EVAL_RENDER_FNS: dict = {}
_EVAL_LPIPS = []  # lazily-constructed singleton ([] = untried, [None] = absent)


def _eval_lpips():
    """LPIPS metric for eval sweeps when weights exist (reference
    train.py:286-296); silently absent otherwise (weights are user
    downloads, like the FLAME pickles)."""
    if not _EVAL_LPIPS:
        from gaussianavatars_tpu.metrics_lib.lpips import (
            LPIPS, lpips_available,
        )

        _EVAL_LPIPS.append(LPIPS() if lpips_available() else None)
    return _EVAL_LPIPS[0]


def evaluate_splits(model, scene, model_cfg, pipe_cfg, state: StepState,
                    flame_fixed, bg, tb_writer=None, iteration=0,
                    num_vis_img: int = 10):
    """Val (novel view) + test (self-reenactment) sweeps
    (reference train.py:256-314), incl. TB render/error image grids."""
    bound = getattr(model, "binding", None) is not None
    flame_full = {**flame_fixed, **state.flame_tr} if bound else {}
    results = {}
    # model.cache_token (not id(model)): id() values recycle after GC, so a
    # long-lived process evaluating several models could hit a stale entry
    # whose closures capture the wrong capacity/model
    render_fns = _EVAL_RENDER_FNS.setdefault(
        (model.cache_token, pipe_cfg.backend, pipe_cfg.capacity,
         model.capacity, model.active_sh_degree), {}
    )
    for split, cameras in (
        ("val", scene.get_val_cameras()), ("test", scene.get_test_cameras()),
    ):
        if not cameras:
            continue
        l1s, psnrs, ssims, lpipses = [], [], [], []
        lpips_fn = _eval_lpips()
        vis_every = max(len(cameras) // num_vis_img, 1)
        vis_ct = 0
        for idx, (cam, gt) in enumerate(
            iterate_once(cameras, model_cfg.resolution)
        ):
            p = cam.to_params(*cam.resolution(model_cfg.resolution))
            key = (p.width, p.height)
            if key not in render_fns:
                render_fns[key] = make_render_fn(
                    model, pipe_cfg, p.width, p.height, model.active_sh_degree
                )
            img = render_fns[key](
                state.params, flame_full,
                binding_arg(model) if bound else None,
                model.active_mask(), camera_arrays(p),
                jnp.asarray(cam.bg, jnp.float32),
                jnp.asarray(cam.timestep or 0, jnp.int32),
            )
            img = jnp.clip(img, 0.0, 1.0)
            gt_j = jnp.clip(jnp.asarray(gt), 0.0, 1.0)
            # keep metrics as device scalars; ONE host fetch per split
            # below (each synchronous fetch pays a full round trip on
            # tunneled frontends)
            l1s.append(l1_metric(img, gt_j))
            psnrs.append(psnr(img, gt_j)[0])
            ssims.append(ssim_metric(img, gt_j))
            if lpips_fn is not None:
                lpipses.append(lpips_fn(img, gt_j)[0])
            if tb_writer is not None and idx % vis_every == 0:
                from gaussianavatars_tpu.utils.image import error_map

                tb_writer.add_images(
                    f"{split}_{vis_ct}/render", np.asarray(img)[None],
                    global_step=iteration)
                tb_writer.add_images(
                    f"{split}_{vis_ct}/error",
                    error_map(np.asarray(img), np.asarray(gt_j))[None],
                    global_step=iteration)
                vis_ct += 1
        l1s, psnrs, ssims = (
            np.asarray(jnp.stack(x)) for x in (l1s, psnrs, ssims))
        results[split] = {
            "l1_loss": float(np.mean(l1s)),
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
        }
        if lpipses:
            results[split]["lpips"] = float(
                np.asarray(jnp.stack(lpipses)).mean())
    return results
