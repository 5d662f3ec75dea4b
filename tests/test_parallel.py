"""Multi-device sharding correctness on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianavatars_tpu.models.gaussians import world_space_gaussians
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
from gaussianavatars_tpu.parallel.mesh import make_mesh
from gaussianavatars_tpu.parallel.sharded import (
    make_sharded_render,
    make_sharded_train_step,
)

from .utils import make_camera, make_scene

BG = jnp.asarray([1.0, 1.0, 1.0])


def to_gauss_params(scene, n):
    """Adapt the test scene dict into a GaussianParams-like pytree."""
    from gaussianavatars_tpu.models.gaussians import GaussianParams

    shs = np.asarray(scene["shs"])
    return GaussianParams(
        xyz=scene["means3d"],
        features_dc=jnp.asarray(shs[:, 0]),
        features_rest=jnp.asarray(
            shs[:, 1:].transpose(0, 2, 1).reshape(shs.shape[0], -1)),
        scaling=jnp.log(scene["scales"]),
        rotation=scene["quats"],
        opacity=jnp.log(scene["opacities"] / (1 - scene["opacities"]))[:, None],
    )


class TestShardedRender:
    def test_matches_single_device(self):
        n = 64  # divisible by 4 prim shards
        cam = make_camera(width=64, height=64)
        scene = make_scene(n=n, seed=0)
        params = to_gauss_params(scene, n)

        # single-device reference
        means3d, scales, quats, opac, shs = world_space_gaussians(
            params, None, None
        )
        ref = rasterize(
            means3d, scales, quats, opac, shs, 2, cam, BG,
            capacity=4096, tile_size=16, chunk=8, backend="jnp",
        ).image

        mesh = make_mesh(n_data=1, n_prim=4)
        render = make_sharded_render(
            mesh, 64, 64, 2, capacity=4096, tile_size=16, chunk=8,
            backend="jnp", bound=False,
        )
        cam_t = (cam.viewmatrix, cam.projmatrix, cam.campos,
                 jnp.asarray(cam.tan_fovx), jnp.asarray(cam.tan_fovy))
        active = jnp.ones(n, bool)
        out = render(params, None, None, active, cam_t, BG)

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestShardedTrainStep:
    def test_grads_match_single_device(self, tmp_path):
        """Sharded (2 data x 4 prim) step == batch-averaged single-device."""
        from gaussianavatars_tpu.config import (
            OptimizationConfig, PipelineConfig,
        )
        from gaussianavatars_tpu.train import optim
        from gaussianavatars_tpu.train.loop import lr_pytree
        import __graft_entry__ as ge

        model = ge._build_tiny_model(str(tmp_path), capacity_granularity=4096)
        # break the isotropic init: with equal scales the covariance is
        # rotation-invariant and rotation grads are exactly zero (noise-only)
        rng_p = np.random.default_rng(42)
        cap0 = model.capacity
        model.params = model.params._replace(
            scaling=model.params.scaling + jnp.asarray(
                rng_p.normal(0, 0.4, (cap0, 3)).astype(np.float32)),
            rotation=model.params.rotation + jnp.asarray(
                rng_p.normal(0, 0.2, (cap0, 4)).astype(np.float32)),
            xyz=model.params.xyz + jnp.asarray(
                rng_p.normal(0, 0.1, (cap0, 3)).astype(np.float32)),
        )
        n_data, n_prim = 2, 4
        width, height = 64, 16 * 2 * n_prim
        mesh = make_mesh(n_data=n_data, n_prim=n_prim)
        opt_cfg = OptimizationConfig()
        pipe_cfg = PipelineConfig(backend="jnp", capacity=131072, chunk=8)

        step = make_sharded_train_step(
            mesh, model, opt_cfg, pipe_cfg, width, height, sh_degree=1,
        )

        flame_tr = model.flame_trainable()
        flame_fixed = {k: v for k, v in model.flame_param.items()
                       if k not in flame_tr}
        mu_g, nu_g, _ = optim.init(model.params)
        mu_f, nu_f, count = optim.init(flame_tr)
        lrs = lr_pytree(opt_cfg, 1e-3, flame_tr, 1.0)
        cap = model.capacity

        cams, cam_params = [], []
        for i in range(n_data):
            p = make_camera(width=width, height=height, dist=6.0, angle=0.3 * i)
            cam_params.append(p)
            cams.append((p.viewmatrix, p.projmatrix, p.campos,
                         jnp.asarray(p.tan_fovx), jnp.asarray(p.tan_fovy)))
        cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        rng = np.random.default_rng(0)
        gts = jnp.asarray(
            rng.random((n_data, 3, height, width)).astype(np.float32))
        bgs = jnp.ones((n_data, 3), jnp.float32)
        timesteps = jnp.asarray([0, 1], jnp.int32)

        out = step(
            model.params, flame_tr, flame_fixed, model.binding_device(),
            model.active_mask(), cam_batch, gts, bgs, timesteps, lrs,
            mu_g, nu_g, mu_f, nu_f, count,
            jnp.zeros(cap), jnp.zeros(cap), jnp.zeros(cap),
        )
        (new_params, new_flame, _, _, _, _, new_count,
         max_radii, accum, denom, losses, total_inst) = out

        # ---- single-device reference: batch-mean loss -> one adam step ----
        from gaussianavatars_tpu.models.flame_gaussians import (
            face_frames_from_verts,
        )
        from gaussianavatars_tpu.ops.ssim import ssim
        from gaussianavatars_tpu.utils.image import l1_loss
        from gaussianavatars_tpu.train.losses import masked_mean, safe_norm

        binding = model.binding_device()
        active = model.active_mask()

        def loss_single(params, flame_tr, off):
            total = 0.0
            for i, p in enumerate(cam_params):
                flame_full = {**flame_fixed, **flame_tr}
                verts = model.verts_at(flame_full, timesteps[i])
                frames = face_frames_from_verts(
                    verts[0], model.flame_model.j_faces)
                m3, sc, qu, op, sh = world_space_gaussians(
                    params, binding, frames)
                res = rasterize(
                    m3, sc, qu, op, sh, 1, p, bgs[i],
                    capacity=131072, tile_size=16, chunk=8, backend="jnp",
                    active=active, means2d_offset=off,
                )
                img = res.image
                vis = res.visibility.astype(jnp.float32)
                li = l1_loss(img, gts[i]) * (1 - opt_cfg.lambda_dssim)
                si = (1 - ssim(img, gts[i])) * opt_cfg.lambda_dssim
                xv = jax.nn.relu(
                    safe_norm(params.xyz, axis=1) - opt_cfg.threshold_xyz)
                xl = masked_mean(xv, vis) * opt_cfg.lambda_xyz
                sv = safe_norm(jax.nn.relu(
                    jnp.exp(params.scaling) - opt_cfg.threshold_scale), axis=1)
                sl = masked_mean(sv, vis) * opt_cfg.lambda_scale
                total = total + (li + si + xl + sl) / len(cam_params)
            return total

        g_ref = jax.grad(loss_single, argnums=(0, 1))(
            model.params, flame_tr, jnp.zeros((cap, 2)))

        mu2, nu2, _ = optim.init(model.params)
        ref_params, _, _, _ = optim.apply(
            model.params, g_ref[0], mu2, nu2, count, lrs["gauss"])

        # Adam normalizes by |grad|, so where grads are ~0 a 1e-7 numeric
        # difference flips the whole +/-lr update. Compare the *updates*
        # with an lr-scaled tolerance plus a cosine-similarity check.
        lrs_g = lrs["gauss"]._asdict()
        for k in model.params._fields:
            old = np.asarray(getattr(model.params, k))
            a = np.asarray(getattr(ref_params, k)) - old
            b = np.asarray(getattr(new_params, k)) - old
            lr_k = float(lrs_g[k])
            diff = np.abs(a - b)
            frac_tight = (diff <= 0.05 * lr_k).mean()
            assert frac_tight > 0.995, (k, frac_tight)
            # worst case is a full sign flip (2*lr) for a gaussian whose
            # grad sits at the float32 noise floor; anything beyond that
            # would indicate a real reduction bug
            assert diff.max() <= 2.1 * lr_k, (k, diff.max())
            if np.linalg.norm(a) > 1e-12:
                cos = np.dot(a.ravel(), b.ravel()) / (
                    np.linalg.norm(a) * np.linalg.norm(b))
                assert cos > 0.99, (k, cos)

        # flame update direction: compare via one adam step
        muf2, nuf2, _ = optim.init(flame_tr)
        ref_flame, _, _, _ = optim.apply(
            flame_tr, g_ref[1], muf2, nuf2, count, lrs["flame"])
        flame_lr = lrs["flame"]
        for k in flame_tr:
            old = np.asarray(flame_tr[k])
            a = np.asarray(ref_flame[k]) - old
            b = np.asarray(new_flame[k]) - old
            np.testing.assert_allclose(
                a, b, atol=0.05 * float(flame_lr[k]), err_msg=k)

        assert int(new_count) == 1
        assert np.isfinite(np.asarray(accum)).all()


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_render_pallas_interpret():
    """shard_map + Pallas kernels (interpret mode on the CPU mesh): the
    combination a real multi-chip run uses."""
    n = 64
    cam = make_camera(width=64, height=64)
    scene = make_scene(n=n, seed=0)
    params = to_gauss_params(scene, n)

    means3d, scales, quats, opac, shs = world_space_gaussians(
        params, None, None
    )
    ref = rasterize(
        means3d, scales, quats, opac, shs, 2, cam, BG,
        capacity=4096, tile_size=16, chunk=8, backend="jnp",
    ).image

    mesh = make_mesh(n_data=1, n_prim=2)
    render = make_sharded_render(
        mesh, 64, 64, 2, capacity=4096, tile_size=16, chunk=8,
        backend="pallas", bound=False,
    )
    cam_t = (cam.viewmatrix, cam.projmatrix, cam.campos,
             jnp.asarray(cam.tan_fovx), jnp.asarray(cam.tan_fovy))
    out = render(params, None, None, jnp.ones(n, bool), cam_t, BG)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
