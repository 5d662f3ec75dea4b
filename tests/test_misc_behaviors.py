"""Small behavioral contracts: scaling modifier, camera select, loader,
camera JSON export."""

import json
import os

import jax.numpy as jnp
import numpy as np

from .utils import make_camera, make_scene


def test_scaling_modifier_shrinks_splats():
    """Viewer scaling control (reference gaussian_renderer/__init__.py:43):
    modifier -> 0 collapses splats toward points -> more background."""
    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

    cam = make_camera(width=48, height=40)
    scene = make_scene(n=60, seed=0)
    bg = jnp.ones(3)

    def render(mod):
        return rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 2, cam, bg,
            capacity=8192, tile_size=16, chunk=8, scaling_modifier=mod,
        )

    full = render(1.0)
    small = render(0.1)
    # shrunken splats cover less -> higher mean transmittance
    assert float(small.transmittance.mean()) > float(full.transmittance.mean())


def test_select_camera_id_filters_train_cameras(tmp_path, monkeypatch):
    from .dataset_fixtures import make_avatar_dataset

    data_dir, asset_dir = make_avatar_dataset(str(tmp_path), n_cams=3)
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    from gaussianavatars_tpu.config import ModelConfig
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame_gaussians import FlameGaussianModel

    cfg = ModelConfig(
        source_path=data_dir, model_path=str(tmp_path / "out"),
        bind_to_mesh=True, eval=True, sh_degree=1, select_camera_id=0,
    )
    os.makedirs(cfg.model_path, exist_ok=True)
    model = FlameGaussianModel(1, capacity_granularity=16384)
    scene = Scene(cfg, model, shuffle=False)
    assert all(c.camera_id == 0 for c in scene.get_train_cameras())
    assert len(scene.get_train_cameras()) == 2  # one per timestep


def test_loader_visits_all_cameras_each_epoch(tmp_path):
    from PIL import Image

    from gaussianavatars_tpu.data.cameras import Camera
    from gaussianavatars_tpu.data.loader import CameraLoader

    cams = []
    for i in range(5):
        path = str(tmp_path / f"{i}.png")
        Image.fromarray(
            np.full((8, 8, 3), i * 10, np.uint8)).save(path)
        cams.append(Camera(
            uid=i, R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
            width=8, height=8, image_path=path, image_name=str(i),
        ))
    loader = CameraLoader(cams, shuffle=True, num_threads=4, seed=0)
    seen = [next(loader)[0].uid for _ in range(15)]
    loader.stop()
    # delivery is strictly epoch-ordered: EVERY 5-window is a permutation
    # (the old thread-interleaved loader only guaranteed this on average)
    for e in range(3):
        assert sorted(seen[5 * e:5 * (e + 1)]) == list(range(5)), seen
    # and reproducible across instances
    loader2 = CameraLoader(cams, shuffle=True, num_threads=2, seed=0)
    seen2 = [next(loader2)[0].uid for _ in range(15)]
    loader2.stop()
    assert seen2 == seen


def test_camera_to_json_layout():
    from gaussianavatars_tpu.data.cameras import Camera, camera_to_json

    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    cam = Camera(
        uid=3, R=Rotation.random(random_state=1).as_matrix(),
        T=rng.normal(size=3), fovx=0.8, fovy=0.6,
        width=640, height=480, image_name="v3",
    )
    d = camera_to_json(3, cam)
    assert set(d) == {"id", "img_name", "width", "height", "position",
                      "rotation", "fy", "fx"}
    assert len(d["position"]) == 3
    assert len(d["rotation"]) == 3 and len(d["rotation"][0]) == 3
    # fx/fy consistent with fov2focal
    from gaussianavatars_tpu.ops.transforms import fov2focal

    assert abs(d["fx"] - fov2focal(0.8, 640)) < 1e-9
    assert json.dumps(d)  # JSON-serializable


def test_error_map_output():
    from gaussianavatars_tpu.utils.image import error_map

    rng = np.random.default_rng(0)
    a = rng.random((3, 16, 16)).astype(np.float32)
    b = rng.random((3, 16, 16)).astype(np.float32)
    m = error_map(a, b)
    assert m.shape == (3, 16, 16)
    assert m.min() >= 0.0 and m.max() <= 1.0


def test_native_imgio_matches_pil(tmp_path):
    """The C++ loader path (libpng/libjpeg + CHW compositing) must be
    bitwise-identical to the PIL path it replaces; skip when no compiler
    can build it."""
    from PIL import Image

    from gaussianavatars_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native imgio unavailable (no compiler/libs)")

    rng = np.random.default_rng(3)
    cases = {}
    rgba = (rng.random((40, 48, 4)) * 255).astype(np.uint8)
    Image.fromarray(rgba, "RGBA").save(tmp_path / "a.png")
    cases["a.png"] = None
    gray = (rng.random((40, 48)) * 255).astype(np.uint8)
    Image.fromarray(gray, "L").save(tmp_path / "g.png")
    cases["g.png"] = None
    rgb = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(tmp_path / "b.jpg", quality=95)
    cases["b.jpg"] = None

    bg = np.array([0.25, 0.5, 1.0], np.float32)
    for name in cases:
        p = str(tmp_path / name)
        raw = native.decode(p)
        assert raw is not None
        out_n = native.to_chw_f32(raw, bg)
        with Image.open(p) as im:
            arr = np.asarray(im).astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, axis=-1)
        if arr.shape[-1] == 4:
            arr = arr[..., :3] * arr[..., 3:4] + bg * (1 - arr[..., 3:4])
        out_p = np.transpose(arr[..., :3], (2, 0, 1))
        np.testing.assert_array_equal(out_n, out_p, err_msg=name)
