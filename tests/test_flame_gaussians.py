"""End-to-end: FLAME-rigged gaussians render differentiably."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianavatars_tpu.models.flame import FlameHead
from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel
from gaussianavatars_tpu.models.gaussians import world_space_gaussians
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

from .flame_fixtures import make_flame_assets
from .utils import make_camera


@pytest.fixture(scope="module")
def flame_head(tmp_path_factory):
    d = tmp_path_factory.mktemp("flame_assets_fg")
    paths = make_flame_assets(str(d), seed=7)
    return FlameHead(
        300, 100,
        flame_model_path=paths["model"],
        flame_lmk_embedding_path=paths["lmk"],
        flame_template_mesh_path=paths["obj"],
        flame_parts_path="/nonexistent",
        add_teeth=True,
    )


def make_meshes(t=3, n_expr=100, seed=0):
    rng = np.random.default_rng(seed)
    meshes = {}
    for i in range(t):
        meshes[i] = dict(
            shape=rng.normal(0, 0.5, 300).astype(np.float32),
            expr=rng.normal(0, 0.3, n_expr).astype(np.float32),
            rotation=rng.normal(0, 0.1, 3).astype(np.float32),
            neck_pose=rng.normal(0, 0.05, 3).astype(np.float32),
            jaw_pose=np.abs(rng.normal(0, 0.1, 3)).astype(np.float32),
            eyes_pose=rng.normal(0, 0.05, 6).astype(np.float32),
            translation=rng.normal(0, 0.05, 3).astype(np.float32),
            static_offset=rng.normal(0, 0.001, (5023, 3)).astype(np.float32),
        )
    return meshes


@pytest.fixture(scope="module")
def model(flame_head):
    m = FlameGaussianModel(
        sh_degree=1, flame_head=flame_head, capacity_granularity=16384
    )
    m.load_meshes(make_meshes(3), {})
    m.create_from_pcd(None, None, spatial_lr_scale=1.0)
    return m


def test_init_one_per_face(model):
    assert model.n_alive == model.flame_model.num_faces
    assert model.num_timesteps == 3
    # shape params broadcast per timestep
    assert model.flame_param["expr"].shape == (3, 100)


def test_frames_and_world_space(model):
    frames = model.face_frames_at(model.flame_param, 0)
    f = model.flame_model.num_faces
    assert frames.center.shape == (f, 3)
    means, scales, quats, opac, shs = world_space_gaussians(
        model.params, model.binding_device(), frames
    )
    n = model.n_alive
    # local xyz = 0 at init: world means == the bound face centers
    np.testing.assert_allclose(
        np.asarray(means)[:n],
        np.asarray(frames.center)[model.binding[:n]],
        atol=1e-5,
    )
    assert np.isfinite(np.asarray(quats)).all()


def test_timesteps_change_frames(model):
    f0 = model.face_frames_at(model.flame_param, 0)
    f1 = model.face_frames_at(model.flame_param, 1)
    assert np.abs(np.asarray(f0.center - f1.center)).max() > 1e-4


def test_render_and_flame_grads(model):
    cam = make_camera(width=32, height=32, dist=6.0)
    bg = jnp.ones(3)
    trainable = model.flame_trainable()
    assert set(trainable) == {
        "rotation", "neck_pose", "jaw_pose", "eyes_pose", "translation", "expr"
    }
    fixed = {k: v for k, v in model.flame_param.items() if k not in trainable}
    binding = model.binding_device()
    active = model.active_mask()

    def loss_fn(params, flame_tr):
        flame_full = {**fixed, **flame_tr}
        frames = model.face_frames_at(flame_full, 1)
        means, scales, quats, opac, shs = world_space_gaussians(
            params, binding, frames
        )
        out = rasterize(
            means, scales, quats, opac, shs, 1, cam, bg,
            capacity=65536, tile_size=16, chunk=8, backend="jnp",
            active=active,
        )
        return jnp.sum(out.image**2)

    g_params, g_flame = jax.grad(loss_fn, argnums=(0, 1))(
        model.params, trainable
    )
    # gradients flow into the FLAME pose/expr at the selected timestep
    g_expr = np.asarray(g_flame["expr"])
    assert np.abs(g_expr[1]).max() > 0
    np.testing.assert_allclose(g_expr[0], 0.0)  # other timesteps untouched
    np.testing.assert_allclose(g_expr[2], 0.0)
    assert np.abs(np.asarray(g_flame["jaw_pose"][1])).max() > 0
    assert np.abs(np.asarray(g_params.xyz)).max() > 0


def test_save_load_roundtrip(model, tmp_path):
    path = str(tmp_path / "point_cloud" / "iteration_10" / "point_cloud.ply")
    model.save_ply(path)

    m2 = FlameGaussianModel(
        sh_degree=1, flame_head=model.flame_model,
        capacity_granularity=16384,
    )
    m2.load_ply(path)
    assert m2.n_alive == model.n_alive
    assert m2.num_timesteps == model.num_timesteps
    np.testing.assert_array_equal(
        m2.binding[:m2.n_alive], model.binding[:model.n_alive]
    )
    np.testing.assert_allclose(
        np.asarray(m2.flame_param["expr"]),
        np.asarray(model.flame_param["expr"]),
    )


def test_regularizers(model):
    verts, verts_cano = model.verts_at(model.flame_param, 0,
                                       return_verts_cano=True)
    loss_d = model.compute_dynamic_offset_loss(model.flame_param, 0)
    assert float(loss_d) == 0.0  # zero offsets at init
    loss_l = model.compute_laplacian_loss(model.flame_param, 0, verts_cano)
    assert np.isfinite(float(loss_l))
