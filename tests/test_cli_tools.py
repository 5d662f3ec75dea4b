"""End-to-end CLI tools: train -> render -> metrics on the synthetic set."""

import json
import os
import sys

import numpy as np
import pytest

from .dataset_fixtures import make_avatar_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli"))
    data_dir, asset_dir = make_avatar_dataset(root)
    os.environ["FLAME_ASSET_DIR"] = asset_dir

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    out = os.path.join(root, "run")
    model_cfg = ModelConfig(
        source_path=data_dir, model_path=out, bind_to_mesh=True,
        eval=True, sh_degree=1,
    )
    opt_cfg = OptimizationConfig(
        iterations=5, densify_from_iter=100, densify_until_iter=0,
        opacity_reset_interval=1000, position_lr_max_steps=5,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=262144, chunk=16)
    training(model_cfg, opt_cfg, pipe_cfg, saving_iterations={5})
    return data_dir, out


def test_render_cli(trained_run):
    data_dir, out = trained_run
    sys.path.insert(0, REPO)
    import render as render_cli

    render_cli.main([
        "-s", data_dir, "-m", out, "--iteration", "5",
        "--bind_to_mesh", "--eval", "--skip_train",
        "--backend", "jnp", "--capacity", "262144", "--chunk", "16",
    ])
    val_dir = os.path.join(out, "val", "ours_5")
    assert os.path.exists(os.path.join(val_dir, "renders", "00000.png"))
    assert os.path.exists(os.path.join(val_dir, "gt", "00000.png"))


def test_metrics_cli(trained_run):
    data_dir, out = trained_run
    sys.path.insert(0, REPO)
    import metrics as metrics_cli

    metrics_cli.evaluate([out], splits=("val", "test"))
    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    assert "ours_5" in results
    assert "PSNR" in results["ours_5"]
    assert np.isfinite(results["ours_5"]["PSNR"])


def test_lpips_with_synthetic_weights(tmp_path):
    """Architecture smoke test with random weights (pretrained are
    user-provided assets, like FLAME)."""
    rng = np.random.default_rng(0)
    out = {}
    ci = 0
    in_ch = 3
    from gaussianavatars_tpu.metrics_lib.lpips import _VGG_STAGES

    for ch, n_convs in _VGG_STAGES:
        for _ in range(n_convs):
            out[f"conv{ci}_w"] = rng.normal(
                0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32)
            out[f"conv{ci}_b"] = np.zeros(ch, np.float32)
            in_ch = ch
            ci += 1
    for i, (ch, _) in enumerate(_VGG_STAGES):
        out[f"lin{i}"] = np.abs(rng.normal(0, 0.01, ch)).astype(np.float32)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **out)

    from gaussianavatars_tpu.metrics_lib.lpips import LPIPS

    m = LPIPS(path)
    a = rng.random((3, 64, 64)).astype(np.float32)
    b = rng.random((3, 64, 64)).astype(np.float32)
    d_ab = float(m(a, b)[0])
    d_aa = float(m(a, a)[0])
    assert d_aa < 1e-6
    assert d_ab > d_aa
    assert np.isfinite(d_ab)


def test_mesh_renderer_smoke():
    from tests.utils import make_camera
    from gaussianavatars_tpu.render.mesh_renderer import (
        rasterize_mesh, render_mesh_overlay,
    )

    cam = make_camera(width=64, height=48, dist=4.0)
    # a quad of two triangles facing the camera at the origin
    verts = np.array([
        [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0],
        [-0.5, 0.5, 0.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rgb, alpha, depth, fid = rasterize_mesh(verts, faces, cam)
    a = np.asarray(alpha)
    assert a.shape == (48, 64)
    assert a.sum() > 20          # quad covers a visible region
    assert a[0, 0] == 0.0        # corners are background
    inside = np.asarray(rgb)[a > 0]
    assert inside.max() > 0.5    # front-facing shading is bright

    over = render_mesh_overlay(verts, faces, cam, opacity=0.5)
    assert np.asarray(over).shape == (3, 48, 64)
