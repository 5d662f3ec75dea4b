"""Integration: scene loading + full training loop on a synthetic dataset."""

import os

import numpy as np
import pytest

from .dataset_fixtures import make_avatar_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    return make_avatar_dataset(root)


def test_scene_loading(dataset, tmp_path, monkeypatch):
    data_dir, asset_dir = dataset
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    from gaussianavatars_tpu.config import ModelConfig
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel

    cfg = ModelConfig(
        source_path=data_dir, model_path=str(tmp_path / "out"),
        bind_to_mesh=True, eval=True, sh_degree=1,
    )
    os.makedirs(cfg.model_path, exist_ok=True)
    model = FlameGaussianModel(1, capacity_granularity=16384)
    scene = Scene(cfg, model, shuffle=False)
    assert len(scene.get_train_cameras()) == 4
    assert len(scene.get_val_cameras()) == 1
    assert len(scene.get_test_cameras()) == 1
    assert model.num_timesteps == 2
    assert model.n_alive == model.flame_model.num_faces
    assert scene.cameras_extent > 0

    # loader yields composited images of the right shape
    from gaussianavatars_tpu.data.loader import iterate_once

    cam, img = next(iterate_once(scene.get_train_cameras()))
    assert img.shape == (3, 40, 48)
    assert img.dtype == np.float32


def test_training_loop_runs_and_learns(dataset, tmp_path, monkeypatch):
    data_dir, asset_dir = dataset
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    out = str(tmp_path / "run")
    model_cfg = ModelConfig(
        source_path=data_dir, model_path=out, bind_to_mesh=True,
        eval=True, sh_degree=1, white_background=False,
    )
    opt_cfg = OptimizationConfig(
        iterations=25,
        densification_interval=10,
        densify_from_iter=5,
        densify_until_iter=22,
        opacity_reset_interval=1000,
        position_lr_max_steps=25,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=262144, chunk=16)

    model, state, info = training(
        model_cfg, opt_cfg, pipe_cfg,
        testing_iterations={25},
        saving_iterations={25},
        checkpoint_iterations={25},
    )

    # loss history is finite and generally decreasing
    hist = [loss for _, loss in info["history"]]
    assert all(np.isfinite(h) for h in hist)
    assert hist[-1] < hist[0] * 1.5  # sanity: not diverging

    # artifacts exist
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_25", "point_cloud.ply"))
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_25", "flame_param.npz"))
    assert os.path.exists(os.path.join(out, "chkpnt25.npz"))
    assert os.path.exists(os.path.join(out, "cfg.json"))
    assert os.path.exists(os.path.join(out, "cameras.json"))

    # densification ran (adam count advanced, model still consistent)
    assert int(state.count) == 25
    assert model.n_alive >= model.flame_model.num_faces


def test_checkpoint_resume(dataset, tmp_path, monkeypatch):
    data_dir, asset_dir = dataset
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    out = str(tmp_path / "run2")
    model_cfg = ModelConfig(
        source_path=data_dir, model_path=out, bind_to_mesh=True,
        eval=True, sh_degree=1,
    )
    opt_cfg = OptimizationConfig(
        iterations=6, densify_from_iter=100, densify_until_iter=0,
        opacity_reset_interval=1000, position_lr_max_steps=6,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=262144, chunk=16)

    training(model_cfg, opt_cfg, pipe_cfg, checkpoint_iterations={4})
    ckpt = os.path.join(out, "chkpnt4.npz")
    assert os.path.exists(ckpt)

    model, state, info = training(
        model_cfg, opt_cfg, pipe_cfg, start_checkpoint=ckpt,
    )
    assert int(state.count) == 6
