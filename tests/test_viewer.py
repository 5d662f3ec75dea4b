"""Viewer layer: GUI wire protocol loopback + orbit camera math."""

import math
import threading

import numpy as np
import pytest

from gaussianavatars_tpu.viewer.network_gui import NetworkGUI
from gaussianavatars_tpu.viewer.orbit_camera import OrbitCamera
from gaussianavatars_tpu.viewer.remote_client import (
    RemoteRenderClient,
    ViewRequest,
)


class TestOrbitCamera:
    def test_pose_at_default(self, tmp_path):
        cam = OrbitCamera(640, 480, r=2.0, fovy=40.0,
                          save_path=str(tmp_path / "camera.json"))
        pose = cam.pose
        np.testing.assert_allclose(pose[:3, 3], [0, 0, 2.0], atol=1e-6)
        # world_view inverts pose
        np.testing.assert_allclose(
            cam.world_view_transform @ pose, np.eye(4), atol=1e-5
        )

    def test_orbit_changes_view(self, tmp_path):
        cam = OrbitCamera(64, 64, save_path=str(tmp_path / "c.json"))
        before = cam.pose.copy()
        cam.orbit_y(0.5)
        assert np.abs(cam.pose - before).max() > 1e-3
        # radius is preserved by orbiting
        np.testing.assert_allclose(
            np.linalg.norm(cam.pose[:3, 3] + cam.look_at),
            cam.radius, atol=1e-5,
        )

    def test_scale_and_pan(self, tmp_path):
        cam = OrbitCamera(64, 64, r=2.0, save_path=str(tmp_path / "c.json"))
        cam.scale(1.0)
        assert cam.radius < 2.0
        cam.pan(dx=10.0)
        assert np.abs(cam.look_at).max() > 0

    def test_save_load_roundtrip(self, tmp_path):
        path = str(tmp_path / "c.json")
        cam = OrbitCamera(64, 64, save_path=path)
        cam.orbit_x(0.3)
        cam.scale(2.0)
        cam.save()
        cam2 = OrbitCamera(64, 64, save_path=path)
        np.testing.assert_allclose(
            cam.pose, cam2.pose, atol=1e-6
        )

    def test_projection_matches_intrinsics(self, tmp_path):
        cam = OrbitCamera(640, 480, fovy=40.0,
                          save_path=str(tmp_path / "c.json"))
        P = cam.projection_matrix
        focal = 480 / (2 * math.tan(math.radians(40.0) / 2))
        assert abs(P[0, 0] - 2 * focal / 640) < 1e-6
        assert abs(P[1, 1] - 2 * focal / 480) < 1e-6


class TestNetworkProtocol:
    def test_loopback_view_request(self):
        server = NetworkGUI(port=16609)
        server.init()

        cam = OrbitCamera(32, 24, r=2.0, fovy=40.0, convention="opengl",
                          save_path="/tmp/nonexistent_cam.json")
        result = {}

        def server_side():
            while server.conn is None:
                server.try_connect()
            mini, msg = server.receive()
            result["mini"] = mini
            result["msg"] = msg
            img = np.full((3, mini.height, mini.width), 0.5, np.float32)
            server.send(img, {"num_timesteps": 7, "num_points": 1234})
            # then a pause message (no reply expected)
            _, msg2 = server.receive()
            result["msg2"] = msg2

        t = threading.Thread(target=server_side, daemon=True)
        t.start()

        client = RemoteRenderClient(port=16609)
        assert client.connect()
        req = ViewRequest(
            width=32, height=24,
            fovx=math.radians(cam.fovx), fovy=math.radians(cam.fovy),
            znear=cam.znear, zfar=cam.zfar,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            timestep=3,
        )
        img, stats = client.request_view(req)
        assert img.shape == (24, 32, 3)
        assert (img == 127).all()  # 0.5 * 255 = 127.5 -> clip/uint8
        assert stats == {"num_timesteps": 7, "num_points": 1234}

        client.request_pause()
        t.join(timeout=5)
        assert not t.is_alive()

        mini = result["mini"]
        assert mini.width == 32 and mini.timestep == 3
        assert result["msg"]["do_training"] is True
        assert result["msg2"]["resolution_x"] == 0

        client.close()
        server.close()


def test_gui_in_training_loop(tmp_path, monkeypatch):
    """The train loop serves a live view request mid-training."""
    from .dataset_fixtures import make_avatar_dataset

    root = str(tmp_path)
    data_dir, asset_dir = make_avatar_dataset(root)
    monkeypatch.setenv("FLAME_ASSET_DIR", asset_dir)

    from gaussianavatars_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.train.loop import training

    server = NetworkGUI(port=16610)
    server.init()

    model_cfg = ModelConfig(
        source_path=data_dir, model_path=str(tmp_path / "out"),
        bind_to_mesh=True, eval=True, sh_degree=1,
    )
    opt_cfg = OptimizationConfig(
        iterations=8, densify_from_iter=100, densify_until_iter=0,
        opacity_reset_interval=1000, position_lr_max_steps=8,
    )
    pipe_cfg = PipelineConfig(backend="jnp", capacity=262144, chunk=16)

    got = {}

    def client_side():
        cam = OrbitCamera(32, 24, r=4.0, fovy=40.0, convention="opengl",
                          save_path="/tmp/nonexistent_cam2.json")
        client = RemoteRenderClient(port=16610, timeout=120)
        assert client.connect(retries=60, wait=0.5)
        req = ViewRequest(
            width=32, height=24,
            fovx=math.radians(cam.fovx), fovy=math.radians(cam.fovy),
            znear=0.01, zfar=100.0,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            timestep=0,
        )
        img, stats = client.request_view(req)
        got["img"] = img
        got["stats"] = stats
        client.close()

    t = threading.Thread(target=client_side, daemon=True)
    t.start()
    training(model_cfg, opt_cfg, pipe_cfg, gui=server)
    t.join(timeout=30)
    server.close()

    assert got["img"].shape == (24, 32, 3)
    assert got["stats"]["num_timesteps"] == 2
    assert got["stats"]["num_points"] > 0
