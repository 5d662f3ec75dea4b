"""shard_map render + train step over the ('data', 'prim') mesh.

The splatting pipeline decomposes across the `prim` axis in two phases:

  phase 1 (gaussian-sharded): binding chain + EWA projection run on each
      device's gaussian shard — embarrassingly parallel per-gaussian math
  re-shard: `all_gather` of the projected per-gaussian screen quantities
      (~40 B/gaussian) over ICI — the SP-style exchange
  phase 2 (tile-sharded): each device bins + blends only its static window
      of tile rows against the full projected set; image slabs concatenate
      across the axis

Backward runs the same graph in reverse automatically: the all_gather
transposes to a psum_scatter, so per-gaussian gradients land exactly on the
shard that owns them — which is also where that shard's Adam state lives.

Loss weighting under replication: every prim device evaluates the image
loss on the (identical) gathered image, so each device's loss carries a
1/n_prim factor — the psum_scatter then sums the n_prim cotangent copies
back to exactly one full gradient, and psum(loss) reports the true value.
Gaussian-space regularizers are shard-partial sums normalized by the
global visible count, so they need no such correction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gaussianavatars_tpu.models.gaussians import world_space_gaussians
from gaussianavatars_tpu.ops.binning import tile_grid
from gaussianavatars_tpu.ops.projection import CameraParams, project_gaussians
from gaussianavatars_tpu.ops.ssim import ssim
from gaussianavatars_tpu.train.losses import safe_norm
from gaussianavatars_tpu.utils.image import l1_loss


def _gathered_render(
    params_shard, binding_shard, frames, active_shard,
    camera: CameraParams, bg, sh_degree, capacity, tile_size, chunk,
    backend, rows_per, means2d_offset_shard=None, binning_impl="dense",
    gather_chunks: int = 4,
):
    """Phase1 on the local shard -> all_gather -> phase2 on local tile rows.

    Runs INSIDE shard_map. Returns (slab [3, rows*ts, W], local radii,
    local valid, aligned instance total).

    `gather_chunks` splits the projected-gaussian all_gather into R
    independent collectives over sub-ranges of the local gaussian axis.
    The forward semantics are identical (concat restores order); the point
    is the BACKWARD: the transpose of each chunk's all_gather is its own
    psum_scatter, so the per-gaussian gradient re-shard decomposes into R
    collectives that XLA's latency-hiding scheduler can overlap with the
    (long) backward-blend compute chain instead of one monolithic
    psum_scatter at the very end — the ">=85% scaling" mechanism
    (SURVEY.md §7 hard part 5; docs/multichip.md).
    """
    means3d, scales, quats, opac, shs = world_space_gaussians(
        params_shard, binding_shard, frames
    )
    proj_local = project_gaussians(
        means3d, scales, quats, opac, shs, sh_degree, camera,
        means2d_offset=means2d_offset_shard,
    )
    if active_shard is not None:
        proj_local = proj_local._replace(
            valid=proj_local.valid & active_shard,
            radii=jnp.where(active_shard, proj_local.radii, 0),
        )

    # SP-style exchange: everyone gets every projected gaussian, in R
    # independently-reshardable chunks (see docstring).
    n_local = proj_local.means2d.shape[0]
    r = max(1, min(gather_chunks, n_local))
    while n_local % r:
        r -= 1
    if r == 1:
        proj_all = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "prim", axis=0, tiled=True),
            proj_local,
        )
    else:
        csz = n_local // r
        n_prim_ax = jax.lax.axis_size("prim")

        def gather_field(x):
            parts = [
                jax.lax.all_gather(
                    x[i * csz:(i + 1) * csz], "prim", axis=0, tiled=True
                ).reshape((n_prim_ax, csz) + x.shape[1:])
                for i in range(r)
            ]
            # [P, csz, ...] x r -> [P, r, csz, ...] -> [P*n_local, ...]
            stacked = jnp.stack(parts, axis=1)
            return stacked.reshape((n_prim_ax * n_local,) + x.shape[1:])

        proj_all = jax.tree.map(gather_field, proj_local)

    pid = jax.lax.axis_index("prim")
    row_start = pid * rows_per

    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

    out = rasterize(
        None, None, None, None, None, sh_degree, camera, bg,
        capacity=capacity, tile_size=tile_size, chunk=chunk,
        backend=backend, binning_impl=binning_impl,
        tile_row_start=row_start, tile_rows=rows_per,
        projected=proj_all,
    )
    return out.image, proj_local.radii, proj_local.valid, out.instance_total


def _camera_from_tuple(cam, width, height):
    return CameraParams(
        viewmatrix=cam[0], projmatrix=cam[1], campos=cam[2],
        tan_fovx=cam[3], tan_fovy=cam[4], width=width, height=height,
    )


def make_sharded_render(
    mesh: Mesh, width: int, height: int, sh_degree: int,
    capacity: int, tile_size: int = 16, chunk: int = 8,
    backend: str = "jnp", bound: bool = True, binning_impl: str = "dense",
):
    """Single-camera render sharded over the 'prim' axis.

    Returns a jitted fn(params, binding, frames, active, cam_tuple, bg)
    -> [3, H, W]; gaussians and tile rows sharded over `prim`.
    """
    n_prim = mesh.shape["prim"]
    _, nty = tile_grid(width, height, tile_size)
    rows_per = -(-nty // n_prim)

    shard = P("prim")
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(shard, shard if bound else rep, rep, shard, rep, rep),
        out_specs=P("prim"),
        # the vma checker can't see through pallas interpret mode
        # (dynamic_slice vma mismatch); correctness is covered by the
        # parity tests against the single-device path
        check_vma=False,
    )
    def fn(params_shard, binding_shard, frames, active_shard, cam, bg):
        camera = _camera_from_tuple(cam, width, height)
        slab, _, _, _ = _gathered_render(
            params_shard, binding_shard if bound else None, frames,
            active_shard, camera, bg, sh_degree, capacity, tile_size,
            chunk, backend, rows_per, binning_impl=binning_impl,
        )
        # concat along leading (row) axis across the prim shards
        return slab.transpose(1, 2, 0)

    @jax.jit
    def render(params, binding, frames, active, cam, bg):
        out = fn(params, binding, frames, active, cam, bg)  # [H_pad, W, 3]
        return out[:height].transpose(2, 0, 1)

    return render


def make_sharded_train_step(
    mesh: Mesh, model, opt_cfg, pipe_cfg, width: int, height: int,
    sh_degree: int,
):
    """Data x render-parallel training step (see module docstring).

    State layout: gaussian params/Adam sharded over 'prim', replicated over
    'data'; FLAME trainables + their Adam replicated; camera batch sharded
    over 'data' (leading dim == data axis size).

    Returns jitted step(...) -> (params, flame_tr, mu_g, nu_g, mu_f, nu_f,
    count, max_radii, accum, denom, losses).
    """
    from gaussianavatars_tpu.models.flame_gaussians import (
        face_frames_from_verts,
    )
    from gaussianavatars_tpu.train import optim

    bound = getattr(model, "binding", None) is not None
    flame_model = getattr(model, "flame_model", None)
    n_prim = mesh.shape["prim"]
    _, nty = tile_grid(width, height, pipe_cfg.tile_size)
    rows_per = -(-nty // n_prim)

    shard = P("prim")
    rep = P()
    data = P("data")

    in_specs = (
        shard,  # params
        rep,    # flame_tr
        rep,    # flame_fixed
        shard,  # binding
        shard,  # active
        data,   # cam tuple [B, ...]
        data,   # gt [B, 3, H, W]
        data,   # bg [B, 3]
        data,   # timestep [B]
        rep,    # lrs (scalars)
        shard,  # mu_g
        shard,  # nu_g
        rep,    # mu_f
        rep,    # nu_f
        rep,    # count
        shard,  # max_radii
        shard,  # accum
        shard,  # denom
    )
    out_specs = (shard, rep, shard, shard, rep, rep, rep,
                 shard, shard, shard, rep, rep)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def step(params, flame_tr, flame_fixed, binding, active, cams, gts,
             bgs, timesteps, lrs, mu_g, nu_g, mu_f, nu_f, count,
             max_radii, accum, denom):
        cam = jax.tree.map(lambda x: x[0], cams)
        gt = gts[0]
        bg = bgs[0]
        timestep = timesteps[0]
        camera = _camera_from_tuple(cam, width, height)

        def loss_fn(params_shard, flame_tr, off_shard):
            if bound:
                flame_full = {**flame_fixed, **flame_tr}
                verts, verts_cano = model.verts_at(
                    flame_full, timestep, return_verts_cano=True
                )
                frames = face_frames_from_verts(verts[0], flame_model.j_faces)
                face_scaling_pg = frames.scaling[binding]
            else:
                frames = None
                verts_cano = None
                face_scaling_pg = None

            slab, radii_loc, vis_loc, total_inst = _gathered_render(
                params_shard, binding if bound else None, frames, active,
                camera, bg, sh_degree, pipe_cfg.capacity,
                pipe_cfg.tile_size, pipe_cfg.chunk, pipe_cfg.backend,
                rows_per, means2d_offset_shard=off_shard,
                binning_impl=getattr(pipe_cfg, "binning", "dense"),
            )
            image = jax.lax.all_gather(
                slab.transpose(1, 2, 0), "prim", axis=0, tiled=True
            )[:height].transpose(2, 0, 1)

            # replication-weighted image terms (see module docstring)
            l1 = l1_loss(image, gt) * (1.0 - opt_cfg.lambda_dssim) / n_prim
            ds = (1.0 - ssim(image, gt)) * opt_cfg.lambda_dssim / n_prim
            losses = {"l1": l1, "ssim": ds}
            total = l1 + ds

            if bound:
                vis = vis_loc.astype(jnp.float32)
                global_cnt = jnp.maximum(jax.lax.psum(vis.sum(), "prim"), 1.0)
                val = jax.nn.relu(
                    safe_norm(params_shard.xyz, axis=1)
                    - opt_cfg.threshold_xyz
                )
                losses["xyz"] = (
                    jnp.sum(val * vis) / global_cnt * opt_cfg.lambda_xyz
                )
                total = total + losses["xyz"]
                if opt_cfg.lambda_scale != 0.0:
                    val = safe_norm(
                        jax.nn.relu(
                            jnp.exp(params_shard.scaling)
                            - opt_cfg.threshold_scale
                        ), axis=1,
                    )
                    losses["scale"] = (
                        jnp.sum(val * vis) / global_cnt * opt_cfg.lambda_scale
                    )
                    total = total + losses["scale"]
                # FLAME-level regularizers (reference train.py:143-161):
                # computed on replicated FLAME params, weighted 1/n_prim so
                # the psum of FLAME grads over 'prim' restores 1x
                if opt_cfg.lambda_dynamic_offset != 0.0:
                    losses["dy_off"] = (
                        model.compute_dynamic_offset_loss(flame_full, timestep)
                        * opt_cfg.lambda_dynamic_offset / n_prim
                    )
                    total = total + losses["dy_off"]
                if (opt_cfg.lambda_dynamic_offset_std != 0.0
                        and "dynamic_offset" in flame_full):
                    std = flame_full["dynamic_offset"].std(axis=0).mean()
                    losses["dynamic_offset_std"] = (
                        std * opt_cfg.lambda_dynamic_offset_std / n_prim
                    )
                    total = total + losses["dynamic_offset_std"]
                if opt_cfg.lambda_laplacian != 0.0:
                    losses["lap"] = (
                        model.compute_laplacian_loss(
                            flame_full, timestep, verts_cano)
                        * opt_cfg.lambda_laplacian / n_prim
                    )
                    total = total + losses["lap"]

            # average over the data (camera batch) axis
            total = jax.lax.pmean(total, "data")
            return total, (losses, radii_loc, vis_loc, total_inst)

        off = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
        grads, aux = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            params, flame_tr, off
        )
        g_params, g_flame, g_off = grads
        losses, radii_loc, vis_loc, total_inst = aux

        # data-axis mean for per-gaussian grads; flame grads additionally
        # accumulate over prim shards (each shard contributed a partial)
        g_params = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), g_params)
        g_flame = jax.tree.map(
            lambda g: jax.lax.psum(jax.lax.pmean(g, "data"), "prim"), g_flame
        )

        new_params, new_mu_g, new_nu_g, _ = optim.apply(
            params, g_params, mu_g, nu_g, count, lrs["gauss"]
        )
        new_flame, new_mu_f, new_nu_f, new_count = optim.apply(
            flame_tr, g_flame, mu_f, nu_f, count, lrs["flame"]
        )

        # densification stats: every data-group saw a different camera, so
        # accumulate contributions from all of them (the single-device loop
        # adds one camera per step; a batch adds all its cameras)
        g_norm = jnp.linalg.norm(g_off, axis=-1)
        accum = accum + jax.lax.psum(jnp.where(vis_loc, g_norm, 0.0), "data")
        denom = denom + jax.lax.psum(vis_loc.astype(jnp.float32), "data")
        max_radii = jnp.maximum(
            max_radii,
            jax.lax.pmax(
                jnp.where(vis_loc, radii_loc.astype(jnp.float32), 0.0), "data"
            ),
        )

        # report true (full) loss values, replicated over both axes
        losses = jax.tree.map(lambda x: jax.lax.pmean(x, "data"), losses)
        for k in list(losses):
            if k in ("l1", "ssim"):
                losses[k] = jax.lax.pmean(losses[k], "prim") * n_prim
            else:
                losses[k] = jax.lax.psum(losses[k], "prim")
        losses["total"] = sum(losses.values())

        # worst-case aligned instance demand across shards (overflow probe)
        total_inst = jax.lax.pmax(
            jax.lax.pmax(total_inst, "prim"), "data"
        )

        return (new_params, new_flame, new_mu_g, new_nu_g, new_mu_f,
                new_nu_f, new_count, max_radii, accum, denom, losses,
                total_inst)

    return jax.jit(step)


def make_multisubject_train_step(
    mesh: Mesh, model, opt_cfg, pipe_cfg, width: int, height: int,
    sh_degree: int,
):
    """Batched multi-subject training: ONE AVATAR PER 'data' GROUP
    (BASELINE.md stretch config; SURVEY.md §2.5 "multi-subject batched
    avatar training").

    Every subject-indexed input carries a leading subject axis S ==
    mesh.shape['data'] and shards over 'data'; within a group, gaussians
    and tile rows shard over 'prim' exactly like the single-subject step.
    Subjects share the FLAME topology/bases (the `model`'s FlameHead) but
    own independent gaussian params, FLAME trainables, Adam moments and
    densify stats — so no gradient averaging happens across 'data';
    each group's optimizer advances its own avatar.

    Returns jitted step(params_s, flame_tr_s, flame_fixed_s, binding_s,
    active_s, cams, gts, bgs, timesteps, lrs, mu_g_s, nu_g_s, mu_f_s,
    nu_f_s, count, max_radii_s, accum_s, denom_s) with every `_s` input
    shaped [S, ...]; outputs mirror inputs plus (losses, total_inst).
    """
    from gaussianavatars_tpu.models.flame_gaussians import (
        face_frames_from_verts,
    )
    from gaussianavatars_tpu.train import optim

    flame_model = getattr(model, "flame_model", None)
    n_prim = mesh.shape["prim"]
    _, nty = tile_grid(width, height, pipe_cfg.tile_size)
    rows_per = -(-nty // n_prim)

    sub = P("data")                  # subject axis
    sub_prim = P("data", "prim")     # subject x gaussian shard
    rep = P()

    in_specs = (
        sub_prim,  # params [S, N, ...]
        sub,       # flame_tr [S, ...]
        sub,       # flame_fixed [S, ...]
        sub_prim,  # binding [S, N]
        sub_prim,  # active [S, N]
        sub,       # cam tuple [S, ...]
        sub,       # gt [S, 3, H, W]
        sub,       # bg [S, 3]
        sub,       # timestep [S]
        rep,       # lrs
        sub_prim,  # mu_g
        sub_prim,  # nu_g
        sub,       # mu_f
        sub,       # nu_f
        rep,       # count
        sub_prim,  # max_radii
        sub_prim,  # accum
        sub_prim,  # denom
    )
    out_specs = (sub_prim, sub, sub_prim, sub_prim, sub, sub, rep,
                 sub_prim, sub_prim, sub_prim, rep, rep)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def step(params_s, flame_tr_s, flame_fixed_s, binding_s, active_s,
             cams, gts, bgs, timesteps, lrs, mu_g, nu_g, mu_f, nu_f,
             count, max_radii, accum, denom):
        # this device's subject (leading axis is 1 after sharding)
        take = lambda t: jax.tree.map(lambda x: x[0], t)
        params = take(params_s)
        flame_tr = take(flame_tr_s)
        flame_fixed = take(flame_fixed_s)
        binding = binding_s[0]
        active = active_s[0]
        cam = take(cams)
        gt, bg, timestep = gts[0], bgs[0], timesteps[0]
        camera = _camera_from_tuple(cam, width, height)

        def loss_fn(params_shard, flame_tr, off_shard):
            flame_full = {**flame_fixed, **flame_tr}
            verts = model.verts_at(flame_full, timestep)
            frames = face_frames_from_verts(verts[0], flame_model.j_faces)

            slab, radii_loc, vis_loc, total_inst = _gathered_render(
                params_shard, binding, frames, active, camera, bg,
                sh_degree, pipe_cfg.capacity, pipe_cfg.tile_size,
                pipe_cfg.chunk, pipe_cfg.backend, rows_per,
                means2d_offset_shard=off_shard,
                binning_impl=getattr(pipe_cfg, "binning", "dense"),
            )
            image = jax.lax.all_gather(
                slab.transpose(1, 2, 0), "prim", axis=0, tiled=True
            )[:height].transpose(2, 0, 1)

            l1 = l1_loss(image, gt) * (1.0 - opt_cfg.lambda_dssim) / n_prim
            ds = (1.0 - ssim(image, gt)) * opt_cfg.lambda_dssim / n_prim
            losses = {"l1": l1, "ssim": ds}
            total = l1 + ds
            vis = vis_loc.astype(jnp.float32)
            global_cnt = jnp.maximum(jax.lax.psum(vis.sum(), "prim"), 1.0)
            val = jax.nn.relu(
                safe_norm(params_shard.xyz, axis=1) - opt_cfg.threshold_xyz
            )
            losses["xyz"] = (
                jnp.sum(val * vis) / global_cnt * opt_cfg.lambda_xyz
            )
            total = total + losses["xyz"]
            if opt_cfg.lambda_scale != 0.0:
                val = safe_norm(
                    jax.nn.relu(jnp.exp(params_shard.scaling)
                                - opt_cfg.threshold_scale), axis=1,
                )
                losses["scale"] = (
                    jnp.sum(val * vis) / global_cnt * opt_cfg.lambda_scale
                )
                total = total + losses["scale"]
            return total, (losses, radii_loc, vis_loc, total_inst)

        off = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
        grads, aux = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            params, flame_tr, off
        )
        g_params, g_flame, g_off = grads
        losses, radii_loc, vis_loc, total_inst = aux

        # NO averaging over 'data': each subject owns its gradients.
        # FLAME grads accumulate over the subject's prim shards only.
        g_flame = jax.tree.map(lambda g: jax.lax.psum(g, "prim"), g_flame)

        new_params, new_mu_g, new_nu_g, _ = optim.apply(
            params, g_params, take(mu_g), take(nu_g), count, lrs["gauss"]
        )
        new_flame, new_mu_f, new_nu_f, new_count = optim.apply(
            flame_tr, g_flame, take(mu_f), take(nu_f), count, lrs["flame"]
        )

        g_norm = jnp.linalg.norm(g_off, axis=-1)
        new_accum = accum[0] + jnp.where(vis_loc, g_norm, 0.0)
        new_denom = denom[0] + vis_loc.astype(jnp.float32)
        new_radii = jnp.maximum(
            max_radii[0], jnp.where(vis_loc, radii_loc.astype(jnp.float32),
                                    0.0)
        )

        # psum over prim restores full values (image terms carry 1/n_prim,
        # regularizers are shard-partial); pmean over data = subject mean
        losses = jax.tree.map(
            lambda x: jax.lax.pmean(jax.lax.psum(x, "prim"), "data"), losses
        )
        total_inst = jax.lax.pmax(jax.lax.pmax(total_inst, "prim"), "data")

        put = lambda t: jax.tree.map(lambda x: x[None], t)
        return (put(new_params), put(new_flame), put(new_mu_g),
                put(new_nu_g), put(new_mu_f), put(new_nu_f), new_count,
                new_radii[None], new_accum[None], new_denom[None], losses,
                total_inst)

    return jax.jit(step)
