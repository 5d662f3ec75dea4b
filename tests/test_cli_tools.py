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


def test_mesh_renderer_output_dict_and_large_triangles():
    """render_mesh returns the reference's {albedo, normal, diffuse, rgba}
    dict (mesh_renderer/__init__.py:269-274); triangles larger than the
    32px patch are fully covered by the multi-resolution passes."""
    import numpy as np

    from gaussianavatars_tpu.render.mesh_renderer import render_mesh
    from .utils import make_camera

    cam = make_camera(width=96, height=80, fovx=0.9, dist=2.0)
    # one triangle spanning most of the frame (bbox >> 32 px)
    verts = np.array([
        [-1.5, -1.2, 0.0], [1.5, -1.2, 0.0], [0.0, 1.4, 0.0],
    ], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    out = render_mesh(verts, faces, cam, background_color=[0.0, 0.0, 0.0],
                      face_colors=np.array([[0.2, 0.5, 0.9]], np.float32))
    assert set(out) == {"albedo", "normal", "diffuse", "rgba"}
    rgba = np.asarray(out["rgba"])
    assert rgba.shape == (80, 96, 4)
    # large interior coverage (the old 32px-patch renderer capped at ~1024px)
    assert (rgba[..., 3] > 0.5).sum() > 2500
    # interior of the covered region is solid (no holes from patch seams)
    ys, xs = np.nonzero(rgba[..., 3] > 0.5)
    cy, cx = int(ys.mean()), int(xs.mean())
    assert rgba[cy - 2:cy + 3, cx - 2:cx + 3, 3].min() == 1.0
    # albedo color gathered from face_colors
    np.testing.assert_allclose(
        np.asarray(out["albedo"])[cy, cx], [0.2, 0.5, 0.9], atol=1e-6)

    # antialiasing softens silhouette pixels: some fractional alphas appear
    out_aa = render_mesh(verts, faces, cam,
                         background_color=[0.0, 0.0, 0.0], antialias=True)
    a = np.asarray(out_aa["rgba"])[..., 3]
    frac = (a > 0.1) & (a < 0.9)
    assert frac.sum() > 10


def test_lpips_matches_torch_reference(tmp_path):
    """Numeric fixture (VERDICT r1 item 8): the JAX LPIPS forward must match
    a straight torch evaluation of the same architecture with the SAME
    (synthetic) weights — validating conv padding, the scaling layer,
    channel normalization, linear heads and pooling beyond shape checks.
    (Pretrained weights are user downloads, absent here like FLAME.)"""
    import torch
    import torch.nn.functional as F

    from gaussianavatars_tpu.metrics_lib.lpips import (
        LPIPS, _SCALE, _SHIFT, _VGG_STAGES,
    )

    rng = np.random.default_rng(42)
    weights = {}
    ci = 0
    in_ch = 3
    for ch, n_convs in _VGG_STAGES:
        for _ in range(n_convs):
            weights[f"conv{ci}_w"] = rng.normal(
                0, 0.08, (ch, in_ch, 3, 3)).astype(np.float32)
            weights[f"conv{ci}_b"] = rng.normal(0, 0.01, ch).astype(np.float32)
            in_ch = ch
            ci += 1
    for i, (ch, _) in enumerate(_VGG_STAGES):
        weights[f"lin{i}"] = np.abs(
            rng.normal(0, 0.05, ch)).astype(np.float32)
    path = str(tmp_path / "w.npz")
    np.savez(path, **weights)

    def torch_lpips(a, b):
        def feats(x):
            x = x * 2.0 - 1.0
            x = (x - torch.tensor(_SHIFT)[None, :, None, None]) / \
                torch.tensor(_SCALE)[None, :, None, None]
            out = []
            ci = 0
            for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
                for _ in range(n_convs):
                    w = torch.tensor(weights[f"conv{ci}_w"])
                    bia = torch.tensor(weights[f"conv{ci}_b"])
                    x = F.relu(F.conv2d(x, w, bia, padding=1))
                    ci += 1
                out.append(x)
                if stage < 4:
                    x = F.max_pool2d(x, 2, 2)
            return out

        fa, fb = feats(a), feats(b)
        total = torch.zeros(a.shape[0])
        for f1, f2, i in zip(fa, fb, range(5)):
            n1 = f1 / torch.sqrt((f1 * f1).sum(1, keepdim=True) + 1e-10)
            n2 = f2 / torch.sqrt((f2 * f2).sum(1, keepdim=True) + 1e-10)
            lin = torch.tensor(weights[f"lin{i}"])[None, :, None, None]
            total = total + ((n1 - n2) ** 2 * lin).sum(1).mean((1, 2))
        return total

    a = rng.random((1, 3, 48, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.15, a.shape), 0, 1).astype(np.float32)
    want = torch_lpips(torch.tensor(a), torch.tensor(b)).numpy()

    got = np.asarray(LPIPS(path)(a, b))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
    assert want[0] > 1e-4  # non-degenerate fixture


def test_eval_lpips_singleton_env(tmp_path, monkeypatch):
    """evaluate_splits adds LPIPS when $LPIPS_WEIGHTS points at weights."""
    from gaussianavatars_tpu.metrics_lib.lpips import _VGG_STAGES
    from gaussianavatars_tpu.train import loop as L

    rng = np.random.default_rng(1)
    weights, ci, in_ch = {}, 0, 3
    for ch, n_convs in _VGG_STAGES:
        for _ in range(n_convs):
            weights[f"conv{ci}_w"] = rng.normal(
                0, 0.05, (ch, in_ch, 3, 3)).astype(np.float32)
            weights[f"conv{ci}_b"] = np.zeros(ch, np.float32)
            in_ch = ch
            ci += 1
    for i, (ch, _) in enumerate(_VGG_STAGES):
        weights[f"lin{i}"] = np.abs(rng.normal(0, 0.01, ch)).astype(np.float32)
    path = str(tmp_path / "w.npz")
    np.savez(path, **weights)

    monkeypatch.setattr(L, "_EVAL_LPIPS", [])
    monkeypatch.setenv("LPIPS_WEIGHTS", path)
    fn = L._eval_lpips()
    assert fn is not None
    d = float(fn(np.zeros((3, 32, 32), np.float32),
                 np.ones((3, 32, 32), np.float32))[0])
    assert np.isfinite(d) and d > 0

    monkeypatch.setattr(L, "_EVAL_LPIPS", [])
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    assert L._eval_lpips() is None
