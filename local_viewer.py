#!/usr/bin/env python3
"""Interactive local viewer for trained avatars (reference local_viewer.py).

Loads a point_cloud.ply (+flame_param.npz), renders with the TPU/JAX
pipeline, and provides orbit-camera navigation, timestep scrubbing, FLAME
expression/pose sliders, a cubic-interpolated keyframe timeline with
trajectory export, and image/video capture. Requires `dearpygui`.
"""

import json
import math
import os
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

import gaussianavatars_tpu.utils.jax_setup  # noqa: F401


class LocalViewerCore:
    """UI-independent core: model loading + rendering + keyframes.

    Kept separate from the DearPyGui shell so it is testable headless.
    """

    def __init__(self, point_path: str, sh_degree: int = 3,
                 motion_path=None, width: int = 960, height: int = 540,
                 radius: float = 1.0, fovy: float = 20.0):
        import jax.numpy as jnp

        from gaussianavatars_tpu.config import PipelineConfig
        from gaussianavatars_tpu.models.flame_gaussians import (
            FlameGaussianModel,
        )
        from gaussianavatars_tpu.models.gaussians import GaussianModel
        from gaussianavatars_tpu.viewer.orbit_camera import OrbitCamera

        self.width, self.height = width, height
        self.cam = OrbitCamera(width, height, r=radius, fovy=fovy,
                               convention="opencv")

        npz = Path(point_path).parent / "flame_param.npz"
        if npz.exists():
            self.model = FlameGaussianModel(sh_degree)
            self.model.load_ply(point_path, motion_path=motion_path)
        else:
            self.model = GaussianModel(sh_degree)
            self.model.load_ply(point_path)
        self.bound = getattr(self.model, "binding", None) is not None

        import jax

        self.pipe = PipelineConfig(
            backend="pallas" if jax.default_backend() == "tpu" else "jnp",
            capacity=2 ** 21, chunk=128 if jax.default_backend() == "tpu" else 16,
        )
        self._render_fns = {}
        self.timestep = 0
        self.param_overrides: dict = {}
        self.keyframes: list[dict] = []

    # ---- rendering --------------------------------------------------------

    def render(self, show_mesh: bool = False, mesh_opacity: float = 0.5,
               scaling_modifier: float = 1.0) -> np.ndarray:
        import jax.numpy as jnp

        from gaussianavatars_tpu.data.cameras import MiniCam
        from gaussianavatars_tpu.train.loop import (
            camera_arrays, make_render_fn,
        )

        mini = MiniCam(
            width=self.width, height=self.height,
            fovx=math.radians(self.cam.fovx),
            fovy=math.radians(self.cam.fovy),
            znear=self.cam.znear, zfar=self.cam.zfar,
            world_view_transform=self.cam.world_view_transform.T,
            full_proj_transform=self.cam.full_proj_transform.T,
            timestep=self.timestep,
        )
        p = mini.to_params()
        key = (p.width, p.height, self.model.capacity,
               self.model.active_sh_degree)
        if key not in self._render_fns:
            self._render_fns[key] = make_render_fn(
                self.model, self.pipe, p.width, p.height,
                self.model.active_sh_degree,
            )
        flame_param = {}
        if self.bound:
            flame_param = dict(self.model.flame_param)
            for k, v in self.param_overrides.items():
                flame_param[k] = jnp.asarray(v)
        params = self.model.params
        if scaling_modifier != 1.0:
            # scales are stored in log space: adding log(m) multiplies the
            # activated scales by m (the viewer's scaling-modifier slider)
            params = params._replace(
                scaling=params.scaling + math.log(max(scaling_modifier,
                                                      1e-6)))
        img = self._render_fns[key](
            params, flame_param,
            self.model.binding_device() if self.bound else None,
            self.model.active_mask(), camera_arrays(p),
            jnp.ones(3, jnp.float32),
            jnp.asarray(self.timestep, jnp.int32),
        )
        out = np.asarray(jnp.clip(img, 0.0, 1.0))
        if show_mesh and self.bound:
            from gaussianavatars_tpu.render.mesh_renderer import (
                rasterize_mesh,
            )

            verts = self.model.verts_at(flame_param, self.timestep)
            rgb, alpha, _, _ = rasterize_mesh(
                np.asarray(verts[0]), self.model.flame_model.faces, p)
            rgb = np.asarray(rgb).transpose(2, 0, 1)
            alpha = np.asarray(alpha)[None]
            out = (rgb * alpha * mesh_opacity
                   + out * (alpha * (1 - mesh_opacity) + (1 - alpha)))
        return out

    def set_expression(self, index: int, value: float):
        """Live FLAME slider (reference update_mesh_by_param_dict)."""
        expr = np.asarray(self.model.flame_param["expr"]).copy()
        expr[:, index] = value
        self.param_overrides["expr"] = expr

    def set_pose(self, key: str, axis: int, value: float):
        pose = np.asarray(self.model.flame_param[key]).copy()
        pose[:, axis] = value
        self.param_overrides[key] = pose

    # ---- keyframe timeline -------------------------------------------------

    def add_keyframe(self):
        # trajectory.json stores xyzw quats (scipy order, the reference
        # viewer's export format); the camera holds wxyz
        self.keyframes.append({
            "rotation": np.roll(self.cam.orientation, -1).tolist(),
            "look_at": list(map(float, self.cam.look_at)),
            "radius": float(self.cam.radius),
            "fovy": float(self.cam.fovy),
            "timestep": int(self.timestep),
        })

    def interpolate_trajectory(self, n_frames: int) -> list[dict]:
        """Cubic interpolation through keyframes (reference
        local_viewer.py keyframe playback)."""
        from scipy.interpolate import CubicSpline
        from scipy.spatial.transform import Rotation, Slerp

        if len(self.keyframes) < 2:
            return [self.keyframes[0]] * n_frames if self.keyframes else []
        ts = np.linspace(0, len(self.keyframes) - 1, n_frames)
        keys = np.arange(len(self.keyframes))
        rots = Rotation.from_quat(
            np.array([k["rotation"] for k in self.keyframes]))
        slerp = Slerp(keys, rots)
        look = CubicSpline(
            keys, np.array([k["look_at"] for k in self.keyframes]))
        radius = CubicSpline(
            keys, np.array([k["radius"] for k in self.keyframes]))
        fovy = CubicSpline(
            keys, np.array([k["fovy"] for k in self.keyframes]))
        tstep = CubicSpline(
            keys, np.array([k["timestep"] for k in self.keyframes]))
        return [
            {
                "rotation": slerp(t).as_quat().tolist(),
                "look_at": look(t).tolist(),
                "radius": float(radius(t)),
                "fovy": float(fovy(t)),
                "timestep": int(round(float(tstep(t)))),
            }
            for t in ts
        ]

    def export_trajectory(self, path: str, n_frames: int = 125):
        with open(path, "w") as f:
            json.dump({
                "keyframes": self.keyframes,
                "frames": self.interpolate_trajectory(n_frames),
            }, f, indent=2)

    def apply_frame(self, frame: dict):
        self.cam.orientation = np.roll(np.asarray(frame["rotation"]), 1)
        self.cam.look_at = np.asarray(frame["look_at"])
        self.cam.radius = frame["radius"]
        self.cam.fovy = frame["fovy"]
        self.timestep = min(frame["timestep"], self.model.num_timesteps - 1)

    def clear_keyframes(self):
        self.keyframes = []

    def reset_overrides(self):
        """Reset all FLAME slider overrides to the loaded parameters."""
        self.param_overrides = {}

    # ---- in-viewer playback / recording (reference local_viewer.py
    # keyframe playback + video record, :122-288, 533-549) ----------------

    def start_playback(self, n_frames: int = 125, loop: bool = True,
                       record_dir=None):
        """Begin stepping through the interpolated keyframe trajectory.
        With `record_dir`, every played frame is captured and an mp4 is
        assembled when playback finishes (record-to-video)."""
        self._frames = self.interpolate_trajectory(n_frames)
        self._play_idx = 0
        self._play_loop = loop and record_dir is None
        self._record_dir = record_dir
        self.playing = bool(self._frames)
        return self.playing

    def stop_playback(self):
        self.playing = False
        if getattr(self, "_record_dir", None):
            self._finish_recording()

    def tick_playback(self):
        """Advance one frame: apply the camera/timestep, optionally record.
        Returns the frame index played, or None when not playing. Call once
        per UI frame."""
        if not getattr(self, "playing", False):
            return None
        idx = self._play_idx
        self.apply_frame(self._frames[idx])
        if self._record_dir is not None:
            self.save_image(
                os.path.join(self._record_dir, f"{idx:05d}.png"))
        self._play_idx += 1
        if self._play_idx >= len(self._frames):
            if self._play_loop:
                self._play_idx = 0
            else:
                self.stop_playback()
        return idx

    def _finish_recording(self):
        import subprocess

        out_dir = self._record_dir
        self._record_dir = None
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "25", "-i",
                 f"{out_dir}/%05d.png", "-pix_fmt", "yuv420p",
                 f"{out_dir}/playback.mp4"],
                check=False, capture_output=True,
            )
        except FileNotFoundError:
            pass  # no ffmpeg: the recorded frames remain the artifact

    def save_image(self, path: str, **render_kwargs):
        from PIL import Image

        img = self.render(**render_kwargs)
        arr = np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr.transpose(1, 2, 0)).save(path)

    def render_trajectory_video(self, out_dir: str, n_frames: int = 125):
        import subprocess

        frames = self.interpolate_trajectory(n_frames)
        for i, fr in enumerate(frames):
            self.apply_frame(fr)
            self.save_image(os.path.join(out_dir, f"{i:05d}.png"))
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", "25", "-i",
                 f"{out_dir}/%05d.png", "-pix_fmt", "yuv420p",
                 f"{out_dir}/trajectory.mp4"],
                check=False, capture_output=True,
            )
        except FileNotFoundError:
            pass  # no ffmpeg: the PNG frames remain the artifact


def main(argv=None):
    parser = ArgumentParser(description="Local viewer")
    parser.add_argument("--point_path", required=True)
    parser.add_argument("--motion_path", default=None)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("-W", type=int, default=960)
    parser.add_argument("-H", type=int, default=540)
    parser.add_argument("--radius", type=float, default=1.0)
    parser.add_argument("--fovy", type=float, default=20.0)
    args = parser.parse_args(argv)

    core = LocalViewerCore(
        args.point_path, args.sh_degree, args.motion_path,
        args.W, args.H, args.radius, args.fovy,
    )

    try:
        import dearpygui.dearpygui as dpg
    except ImportError:
        print("local_viewer UI requires dearpygui; core API is available as "
              "local_viewer.LocalViewerCore for headless rendering.")
        sys.exit(1)

    buf = np.ones((args.H, args.W, 3), np.float32)
    dpg.create_context()
    with dpg.texture_registry(show=False):
        dpg.add_raw_texture(args.W, args.H, buf,
                            format=dpg.mvFormat_Float_rgb, tag="_texture")
    with dpg.window(tag="_primary"):
        dpg.add_image("_texture")
    dpg.set_primary_window("_primary", True)

    JOINTS = ("rotation", "neck_pose", "jaw_pose", "eyes_pose")
    N_EXPR = 10

    with dpg.window(label="Control", width=360, height=args.H - 20,
                    pos=(10, 10)):
        dpg.add_slider_int(
            label="timestep", min_value=0,
            max_value=core.model.num_timesteps - 1, tag="_t")
        dpg.add_checkbox(label="show mesh", tag="_mesh")
        dpg.add_slider_float(label="mesh opacity", default_value=0.5,
                             min_value=0, max_value=1, tag="_mop")
        dpg.add_slider_float(label="scaling modifier", default_value=1.0,
                             min_value=0, max_value=1, tag="_smod")

        with dpg.collapsing_header(label="FLAME joints", default_open=True):
            for joint in JOINTS:
                n_ax = 6 if joint == "eyes_pose" else 3
                with dpg.tree_node(label=joint, default_open=(
                        joint == "jaw_pose")):
                    for ax in range(n_ax):
                        dpg.add_slider_float(
                            label=f"{joint}[{ax}]", default_value=0.0,
                            min_value=-0.5, max_value=0.5,
                            tag=f"_p_{joint}_{ax}")

        with dpg.collapsing_header(label="expression", default_open=True):
            for i in range(N_EXPR):
                dpg.add_slider_float(label=f"expr {i}", default_value=0.0,
                                     min_value=-3, max_value=3,
                                     tag=f"_e{i}")
        dpg.add_button(label="reset sliders", callback=lambda: (
            core.reset_overrides(),
            [dpg.set_value(f"_e{i}", 0.0) for i in range(N_EXPR)],
            [dpg.set_value(f"_p_{j}_{ax}", 0.0) for j in JOINTS
             for ax in range(6 if j == "eyes_pose" else 3)],
        ))

        with dpg.collapsing_header(label="keyframe timeline",
                                   default_open=True):
            dpg.add_text("keyframes: 0", tag="_kf_count")
            dpg.add_button(label="add keyframe", callback=lambda: (
                core.add_keyframe(),
                dpg.set_value("_kf_count",
                              f"keyframes: {len(core.keyframes)}")))
            dpg.add_button(label="clear keyframes", callback=lambda: (
                core.clear_keyframes(),
                dpg.set_value("_kf_count", "keyframes: 0")))
            dpg.add_input_int(label="frames", default_value=125,
                              tag="_nframes")
            dpg.add_checkbox(label="record to video", tag="_record")

            def _toggle_play():
                if getattr(core, "playing", False):
                    core.stop_playback()
                else:
                    rec = None
                    if dpg.get_value("_record"):
                        rec = f"playback_{time.time():.0f}"
                        os.makedirs(rec, exist_ok=True)
                    core.start_playback(dpg.get_value("_nframes"),
                                        record_dir=rec)

            dpg.add_button(label="play / pause", callback=_toggle_play)
            dpg.add_button(
                label="export trajectory",
                callback=lambda: core.export_trajectory("trajectory.json"))
        dpg.add_button(
            label="screenshot",
            callback=lambda: core.save_image(f"capture_{time.time():.0f}.png"))

    def on_drag(sender, app_data):
        core.cam.orbit_x(-app_data[2] * 0.005)
        core.cam.orbit_y(-app_data[1] * 0.005)

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                   callback=on_drag)
        dpg.add_mouse_wheel_handler(callback=lambda s, a: core.cam.scale(a))
        dpg.add_mouse_drag_handler(
            button=dpg.mvMouseButton_Middle,
            callback=lambda s, a: core.cam.pan(dx=a[1] * 0.05, dy=a[2] * 0.05))

    dpg.create_viewport(title="GaussianAvatars-TPU Local Viewer",
                        width=args.W + 20, height=args.H + 40)
    dpg.setup_dearpygui()
    dpg.show_viewport()

    while dpg.is_dearpygui_running():
        if core.tick_playback() is not None:
            dpg.set_value("_t", core.timestep)
        else:
            core.timestep = dpg.get_value("_t")
            if core.bound:
                for joint in JOINTS:
                    n_ax = 6 if joint == "eyes_pose" else 3
                    for ax in range(n_ax):
                        v = dpg.get_value(f"_p_{joint}_{ax}")
                        if v != 0.0:
                            core.set_pose(joint, ax, v)
                for i in range(N_EXPR):
                    v = dpg.get_value(f"_e{i}")
                    if v != 0.0:
                        core.set_expression(i, v)
        img = core.render(show_mesh=dpg.get_value("_mesh"),
                          mesh_opacity=dpg.get_value("_mop"),
                          scaling_modifier=dpg.get_value("_smod"))
        buf[:] = img.transpose(1, 2, 0)
        dpg.set_value("_texture", buf)
        dpg.render_dearpygui_frame()

    dpg.destroy_context()


if __name__ == "__main__":
    main()
