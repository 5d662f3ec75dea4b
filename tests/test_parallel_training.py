"""End-to-end --data_parallel/--render_parallel training on the CPU mesh.

VERDICT r1 item 3: sharded training must be a *feature* of the training CLI,
not just a library — including densification (host surgery -> automatic
re-shard of params/Adam/binding/stats on the next jitted step).
"""

import os

import numpy as np
import pytest

from .dataset_fixtures import make_avatar_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dspar"))
    return make_avatar_dataset(root)


def _run(data_dir, out, n_data, n_prim, iters=12):
    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    model_cfg = ModelConfig(
        source_path=data_dir, model_path=out, bind_to_mesh=True,
        eval=True, sh_degree=1, white_background=False,
    )
    opt_cfg = OptimizationConfig(
        iterations=iters,
        densification_interval=6,
        densify_from_iter=3,
        densify_until_iter=iters,
        opacity_reset_interval=1000,
        position_lr_max_steps=iters,
    )
    pipe_cfg = PipelineConfig(
        backend="jnp", capacity=131072, chunk=16, tile_size=16,
        data_parallel=n_data, render_parallel=n_prim,
    )
    return training(
        model_cfg, opt_cfg, pipe_cfg, saving_iterations={iters},
        log_every=1,
    )


def test_sharded_training_matches_single_device(dataset, tmp_path,
                                                monkeypatch):
    """mesh (1 data, 8 prim) with the same camera order as single-device:
    the loss trajectory must match to numerical tolerance, across a
    densification event."""
    data_dir, asset_dir = dataset
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    _, state_s, info_s = _run(data_dir, str(tmp_path / "single"), 1, 1)
    model_p, state_p, info_p = _run(data_dir, str(tmp_path / "prim8"), 1, 8)

    hist_s = np.array([l for _, l in info_s["history"]])
    hist_p = np.array([l for _, l in info_p["history"]])
    assert np.all(np.isfinite(hist_p))
    # same cameras, same math, different reduction order/sharding
    np.testing.assert_allclose(hist_p, hist_s, rtol=2e-2, atol=2e-3)

    # densification actually ran under sharding and artifacts exist
    assert model_p.n_alive >= model_p.flame_model.num_faces
    assert int(state_p.count) == 12
    assert os.path.exists(os.path.join(
        str(tmp_path / "prim8"), "point_cloud", "iteration_12",
        "point_cloud.ply"))


def test_data_x_prim_mesh_trains(dataset, tmp_path, monkeypatch):
    """(2 data, 4 prim): batched cameras per step, finite decreasing loss,
    densify event crossed."""
    data_dir, asset_dir = dataset
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    model, state, info = _run(data_dir, str(tmp_path / "d2p4"), 2, 4)
    hist = np.array([l for _, l in info["history"]])
    assert np.all(np.isfinite(hist))
    # EMA warms up from 0 over the first ~6 steps; require the tail to be
    # non-diverging past the warmup
    assert hist[-1] <= hist[6] * 1.1
    assert int(state.count) == 12
    assert model.n_alive >= model.flame_model.num_faces
