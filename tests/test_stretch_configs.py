"""BASELINE.md stretch configs on the virtual 8-device mesh.

4K rendering exercises the tile-row-sharded renderer at a resolution where
a single device's tile grid would overflow the dense binning's packed-key
field — the sharding IS the mechanism that keeps per-device tile counts
bounded (SURVEY.md §5 long-context analog).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("width,height", [(3840, 2160)])
def test_4k_render_tile_row_sharded(width, height):
    from gaussianavatars_tpu.parallel.mesh import make_mesh
    from gaussianavatars_tpu.parallel.sharded import make_sharded_render
    from .utils import make_camera, make_scene

    n_prim = 8
    mesh = make_mesh(n_data=1, n_prim=n_prim)
    n = 1024
    scene = make_scene(n=n, seed=0, sh_degree=1, spread=0.5,
                       scale_mean=-1.2)

    render = make_sharded_render(
        mesh, width, height, sh_degree=1, capacity=2 ** 17,
        tile_size=32, chunk=8, backend="jnp", bound=False,
    )

    cam = make_camera(width=width, height=height, fovx=0.9, dist=4.0)
    from gaussianavatars_tpu.models.gaussians import GaussianParams

    params = GaussianParams(
        xyz=scene["means3d"],
        features_dc=scene["shs"][:, 0],
        features_rest=jnp.swapaxes(scene["shs"][:, 1:], -1, -2)
        .reshape(scene["shs"].shape[0], -1),
        scaling=jnp.log(scene["scales"]),
        rotation=scene["quats"],
        opacity=jnp.log(scene["opacities"] / (1 - scene["opacities"]))[:, None],
    )
    active = jnp.ones((n,), bool)
    cam_tuple = (cam.viewmatrix, cam.projmatrix, cam.campos,
                 jnp.asarray(cam.tan_fovx), jnp.asarray(cam.tan_fovy))
    img = render(params, None, None, active, cam_tuple, jnp.ones(3))
    img = np.asarray(img)
    assert img.shape == (3, height, width)
    assert np.isfinite(img).all()
    # the cloud actually renders: center differs from the white background
    assert img.min() < 0.95


def _subject_state(model, scale):
    """Perturbed per-subject copies of a model's trainable state."""
    from gaussianavatars_tpu.train import optim

    params = jax.tree.map(lambda x: x * scale, model.params)
    flame_tr = {k: v * scale for k, v in model.flame_trainable().items()}
    mu_g, nu_g, _ = optim.init(params)
    mu_f, nu_f, count = optim.init(flame_tr)
    return params, flame_tr, mu_g, nu_g, mu_f, nu_f, count


def test_multisubject_batched_training_matches_solo_runs(tmp_path):
    """(2 subjects x 4 prim): each data group trains its OWN avatar; the
    batched step must reproduce per-subject solo runs exactly (BASELINE.md
    stretch: multi-subject batched avatar training)."""
    import __graft_entry__ as GE
    from gaussianavatars_tpu.config import (
        OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.parallel.mesh import make_mesh
    from gaussianavatars_tpu.parallel.sharded import (
        make_multisubject_train_step,
    )
    from gaussianavatars_tpu.train.loop import lr_pytree
    from .utils import make_camera

    model = GE._build_tiny_model(str(tmp_path), capacity_granularity=4096)
    width, height = 64, 64
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="jnp", capacity=65536, chunk=8,
                              tile_size=16)

    subjects = [_subject_state(model, 1.0), _subject_state(model, 0.9)]
    flame_fixed = {
        k: v for k, v in model.flame_param.items()
        if k not in subjects[0][1]
    }
    lrs = lr_pytree(opt_cfg, 1e-3, subjects[0][1], 1.0)
    cap = model.capacity
    binding = model.binding_device()
    active = model.active_mask()

    cams = []
    for i in range(2):
        p = make_camera(width=width, height=height, dist=6.0, angle=0.25 * i)
        cams.append((p.viewmatrix, p.projmatrix, p.campos,
                     jnp.asarray(p.tan_fovx), jnp.asarray(p.tan_fovy)))
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.random((2, 3, height, width)).astype(np.float32))
    bgs = jnp.ones((2, 3), jnp.float32)
    timesteps = jnp.asarray([0, 1], jnp.int32)

    def stack(i_list, axis=0):
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis), *i_list)

    def batched_inputs(sub_idx_list, cams_sel, gts_sel, bgs_sel, ts_sel):
        ps = stack([subjects[i][0] for i in sub_idx_list])
        fs = stack([subjects[i][1] for i in sub_idx_list])
        ff = stack([flame_fixed for _ in sub_idx_list])
        mg = stack([subjects[i][2] for i in sub_idx_list])
        ng = stack([subjects[i][3] for i in sub_idx_list])
        mf = stack([subjects[i][4] for i in sub_idx_list])
        nf = stack([subjects[i][5] for i in sub_idx_list])
        s = len(sub_idx_list)
        return (
            ps, fs, ff,
            jnp.broadcast_to(binding, (s,) + binding.shape),
            jnp.broadcast_to(active, (s,) + active.shape),
            stack(cams_sel), gts_sel, bgs_sel, ts_sel, lrs,
            mg, ng, mf, nf, subjects[0][6],
            jnp.zeros((s, cap)), jnp.zeros((s, cap)), jnp.zeros((s, cap)),
        )

    # batched 2x4 run
    mesh = make_mesh(n_data=2, n_prim=4)
    step = make_multisubject_train_step(
        mesh, model, opt_cfg, pipe_cfg, width, height, sh_degree=1)
    out = step(*batched_inputs([0, 1], cams, gts, bgs, timesteps))
    jax.block_until_ready(out)
    params_b, flame_b = out[0], out[1]
    losses_b = out[-2]
    assert all(np.isfinite(float(v)) for v in losses_b.values())

    # per-subject solo runs on a (1, 4) mesh must match exactly
    mesh1 = make_mesh(n_data=1, n_prim=4)
    step1 = make_multisubject_train_step(
        mesh1, model, opt_cfg, pipe_cfg, width, height, sh_degree=1)
    for i in range(2):
        outi = step1(*batched_inputs(
            [i], [cams[i]], gts[i:i + 1], bgs[i:i + 1],
            timesteps[i:i + 1]))
        np.testing.assert_allclose(
            np.asarray(outi[0].xyz[0]), np.asarray(params_b.xyz[i]),
            atol=1e-6)
        for k in flame_b:
            np.testing.assert_allclose(
                np.asarray(outi[1][k][0]), np.asarray(flame_b[k][i]),
                atol=1e-6)


def test_multisubject_driver_densify_rebucket(tmp_path):
    """Host driver: batched training ACROSS a densify event re-buckets
    subjects onto a common capacity and matches per-subject solo runs
    (the multi-subject analog of the sharded densify parity test)."""
    import dataclasses
    import __graft_entry__ as GE
    from gaussianavatars_tpu.config import OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.parallel.mesh import make_mesh
    from gaussianavatars_tpu.train.multisubject import MultiSubjectTrainer
    from .utils import make_camera

    width = height = 64

    def build_models(paths):
        models = []
        for scale in (1.0, 0.9):
            m = GE._build_tiny_model(str(paths), capacity_granularity=1024)
            m.params = jax.tree.map(lambda x: x * scale, m.params)
            models.append(m)
        return models

    opt_cfg = OptimizationConfig(
        densify_from_iter=1, densification_interval=2,
        densify_until_iter=100, densify_grad_threshold=1e-12,
        opacity_reset_interval=10_000, percent_dense=0.01,
    )

    rng = np.random.default_rng(3)
    gts = rng.random((2, 8, 3, height, width)).astype(np.float32)

    def batch_fn(subject, iteration):
        p = make_camera(width=width, height=height, dist=6.0,
                        angle=0.2 * subject + 0.05 * iteration)
        cam = (p.viewmatrix, p.projmatrix, p.campos,
               jnp.asarray(p.tan_fovx), jnp.asarray(p.tan_fovy))
        return cam, gts[subject, iteration % 8], np.ones(3, np.float32), 0

    def run(sub_indices, n_data, subdir):
        pipe_cfg = PipelineConfig(backend="jnp", capacity=65536, chunk=8,
                                  tile_size=16)
        models = build_models(tmp_path / subdir)
        models = [models[i] for i in sub_indices]
        mesh = make_mesh(n_data=n_data, n_prim=4)
        tr = MultiSubjectTrainer(
            models, mesh, opt_cfg, pipe_cfg, width, height,
            extents=[6.0] * len(models),
        )
        bf = (batch_fn if n_data == 2
              else lambda _, it: batch_fn(sub_indices[0], it))
        tr.train(bf, 1, 4, densify=True)
        return tr

    tr_b = run([0, 1], 2, "b")

    # densify fired (threshold ~0 forces clones) and capacities re-bucketed
    assert all(m.n_alive > 0 for m in tr_b.models)
    caps = {m.capacity for m in tr_b.models}
    assert caps == {tr_b.common_capacity}
    assert tr_b.common_capacity >= max(m.n_alive for m in tr_b.models)

    # per-subject solo runs reproduce the batched trajectories
    for i in range(2):
        tr_s = run([i], 1, f"s{i}")
        mb, ms = tr_b.models[i], tr_s.models[0]
        assert ms.n_alive == mb.n_alive
        np.testing.assert_allclose(
            np.asarray(ms.params.xyz[:ms.n_alive]),
            np.asarray(mb.params.xyz[:mb.n_alive]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ms.params.opacity[:ms.n_alive]),
            np.asarray(mb.params.opacity[:mb.n_alive]), atol=1e-6)


def test_single_chip_slab_render_matches_full_frame(tmp_path):
    """pipe.slab_tile_rows: tile-row-windowed inference must reproduce the
    full-frame render exactly (the single-chip 4K path; on hardware the
    full 4K tile grid exceeds the kernels' scalar-prefetch SMEM)."""
    from gaussianavatars_tpu.config import PipelineConfig
    from gaussianavatars_tpu.models.gaussians import GaussianModel, GaussianParams
    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn
    from .utils import make_camera, make_scene

    scene = make_scene(n=512, seed=5, sh_degree=1, spread=0.8,
                       scale_mean=-1.6)
    model = GaussianModel(1)
    model.params = GaussianParams(
        xyz=scene["means3d"], features_dc=scene["shs"][:, 0],
        features_rest=jnp.swapaxes(scene["shs"][:, 1:], -1, -2)
        .reshape(scene["shs"].shape[0], -1),
        scaling=jnp.log(scene["scales"]), rotation=scene["quats"],
        opacity=jnp.log(scene["opacities"] / (1 - scene["opacities"]))[:, None],
    )
    model.n_alive = 512
    model.active_sh_degree = 1

    p = make_camera(width=96, height=80, dist=5.0)  # 6x5 tiles at 16
    args = (model.params, {}, None, model.active_mask(), camera_arrays(p),
            jnp.ones(3), jnp.int32(0))
    imgs = {}
    for rows in (0, 2, 3):
        pipe = PipelineConfig(backend="jnp", capacity=65536, chunk=8,
                              tile_size=16, slab_tile_rows=rows)
        imgs[rows] = np.asarray(
            make_render_fn(model, pipe, 96, 80, 1)(*args))
    assert imgs[0].shape == (3, 80, 96)
    np.testing.assert_allclose(imgs[2], imgs[0], atol=1e-6)
    np.testing.assert_allclose(imgs[3], imgs[0], atol=1e-6)


def test_python_debug_paths_match_default_render(tmp_path):
    """pipe.convert_SHs_python / compute_cov3D_python (the reference's
    debug pipeline flags, gaussian_renderer/__init__.py:63-81) must
    reproduce the default fused paths."""
    from gaussianavatars_tpu.config import PipelineConfig
    from gaussianavatars_tpu.models.gaussians import (
        GaussianModel, GaussianParams,
    )
    from gaussianavatars_tpu.train.loop import camera_arrays, make_render_fn
    from .utils import make_camera, make_scene

    scene = make_scene(n=256, seed=9, sh_degree=2, spread=0.8,
                       scale_mean=-1.6)
    model = GaussianModel(2)
    model.params = GaussianParams(
        xyz=scene["means3d"], features_dc=scene["shs"][:, 0],
        features_rest=jnp.swapaxes(scene["shs"][:, 1:], -1, -2)
        .reshape(scene["shs"].shape[0], -1),
        scaling=jnp.log(scene["scales"]), rotation=scene["quats"],
        opacity=jnp.log(scene["opacities"] / (1 - scene["opacities"]))[:, None],
    )
    model.n_alive = 256
    model.active_sh_degree = 2

    p = make_camera(width=64, height=48, dist=5.0)
    args = (model.params, {}, None, model.active_mask(), camera_arrays(p),
            jnp.ones(3), jnp.int32(0))
    imgs = {}
    for flags in ((False, False), (True, False), (False, True), (True, True)):
        pipe = PipelineConfig(backend="jnp", capacity=65536, chunk=8,
                              tile_size=16, convert_SHs_python=flags[0],
                              compute_cov3D_python=flags[1])
        imgs[flags] = np.asarray(make_render_fn(model, pipe, 64, 48, 2)(*args))
    base = imgs[(False, False)]
    assert np.isfinite(base).all()
    for flags, img in imgs.items():
        np.testing.assert_allclose(img, base, atol=2e-5,
                                   err_msg=str(flags))
