"""Dataclass-based configuration with reflective argparse generation.

Equivalent of reference arguments/__init__.py:19-132 with the same flag
names, shorthands and defaults, so command lines transfer 1:1. Departures:
configs persist as JSON (`cfg.json`) instead of an eval'able repr — the
repr-style `cfg_args` file is still written for reference-tool compat but
never eval'd on load.
"""

from __future__ import annotations

import dataclasses
import json
import os
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field


def _add_group(parser: ArgumentParser, cfg, name: str, shorthand_fields=(),
               sentinel: bool = False):
    """Reflect dataclass fields into argparse flags. With `sentinel`,
    non-bool defaults become None so a saved config can fill them in
    (reference ParamGroup(fill_none) behavior)."""
    group = parser.add_argument_group(name)
    defaults = type(cfg)()
    for f in dataclasses.fields(cfg):
        key = f.name
        default = getattr(defaults, key)
        if isinstance(default, tuple):
            continue        # internal host-grown knobs, not CLI flags

        flags = [f"--{key}"]
        if key in shorthand_fields:
            flags.append(f"-{key[0]}")
        if isinstance(default, bool):
            # sentinel: unset bool flags stay None so a saved config wins
            group.add_argument(
                *flags, default=None if sentinel else default,
                action="store_true",
            )
        else:
            group.add_argument(
                *flags, default=None if sentinel else default,
                type=type(default),
            )
    return group


def _extract(cfg_cls, args: Namespace):
    known = {f.name for f in dataclasses.fields(cfg_cls)}
    return cfg_cls(**{k: v for k, v in vars(args).items() if k in known})


@dataclass
class ModelConfig:
    """reference arguments/__init__.py:47-67 (ModelParams)."""

    sh_degree: int = 3
    source_path: str = ""
    target_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"    # accepted for reference-CLI
                                 # compatibility; images are host
                                 # arrays fed per step either way
    eval: bool = False
    bind_to_mesh: bool = False
    disable_flame_static_offset: bool = False
    not_finetune_flame_params: bool = False
    select_camera_id: int = -1

    SHORTHANDS = ("source_path", "target_path", "model_path", "images",
                  "resolution", "white_background")

    @classmethod
    def add_to_parser(cls, parser, sentinel=False):
        _add_group(parser, cls(), "Loading Parameters", cls.SHORTHANDS,
                   sentinel=sentinel)

    @classmethod
    def extract(cls, args):
        cfg = _extract(cls, args)
        cfg.source_path = os.path.abspath(cfg.source_path)
        return cfg


@dataclass
class PipelineConfig:
    """reference arguments/__init__.py:69-74 + TPU-side static knobs."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # TPU-native additions
    backend: str = "pallas"        # 'pallas' on TPU, 'jnp' anywhere
    tile_size: int = 32            # 32x32 pixel tiles: ~3x fewer instances
                                   # than 16x16 at equal image output
    chunk: int = 128
    capacity: int = 2 ** 20        # live-instance bucket (re-grown on demand)
    binning: str = "dense"         # 'dense' (multi-level, exact, fast) or
                                   # 'sort' (variable-rect expansion)
    slab_tile_rows: int = 0        # >0: inference renders in tile-row
                                   # windows of this many rows (single-chip
                                   # high-resolution path; 4K exceeds the
                                   # scalar-prefetch SMEM in one pass)
    level_scale: int = 1           # dense tail-bucket multiplier, ALL
                                   # levels (legacy global grow knob)
    level_scales: tuple = ()       # per-tail-level multipliers (grown by
                                   # the loop from the level-tagged
                                   # rect_overflow probe; index = bucket
                                   # level, i.e. plan level - 1)
    data_parallel: int = 1         # camera-batch groups over the 'data' axis
    render_parallel: int = 1       # gaussian/tile shards over the 'prim' axis
                                   # (data_parallel*render_parallel devices)

    @classmethod
    def add_to_parser(cls, parser):
        _add_group(parser, cls(), "Pipeline Parameters")

    @classmethod
    def extract(cls, args):
        return _extract(cls, args)


@dataclass
class OptimizationConfig:
    """reference arguments/__init__.py:76-110 (OptimizationParams)."""

    iterations: int = 600_000
    position_lr_init: float = 0.005
    position_lr_final: float = 0.00005
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 600_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.017
    rotation_lr: float = 0.001
    densification_interval: int = 2_000
    opacity_reset_interval: int = 60_000
    densify_from_iter: int = 10_000
    densify_until_iter: int = 600_000
    densify_grad_threshold: float = 0.0002
    # "reference" reproduces the reference's literal screen-size-prune
    # behavior (max_radii2D zeroed by densification before the prune reads
    # it -> the test never fires); "effective" prunes on pre-densify radii
    screen_size_prune: str = "reference"

    flame_expr_lr: float = 1e-3
    flame_trans_lr: float = 1e-6
    flame_pose_lr: float = 1e-5
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_xyz: float = 1e-2
    threshold_xyz: float = 1.0
    metric_xyz: bool = False
    lambda_scale: float = 1.0
    threshold_scale: float = 0.6
    metric_scale: bool = False
    lambda_dynamic_offset: float = 0.0
    lambda_laplacian: float = 0.0
    lambda_dynamic_offset_std: float = 0.0

    @classmethod
    def add_to_parser(cls, parser):
        _add_group(parser, cls(), "Optimization Parameters")

    @classmethod
    def extract(cls, args):
        return _extract(cls, args)


def save_config(model_path: str, model_cfg: ModelConfig):
    """Persist run config: JSON (authoritative) + repr-style cfg_args
    (reference train.py:227-228 compat; never eval'd by us)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg.json"), "w") as f:
        json.dump(dataclasses.asdict(model_cfg), f, indent=2)
    ns = Namespace(**dataclasses.asdict(model_cfg))
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(ns))


def load_config(model_path: str) -> ModelConfig:
    path = os.path.join(model_path, "cfg.json")
    with open(path) as f:
        data = json.load(f)
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    return ModelConfig(**{k: v for k, v in data.items() if k in known})


def get_combined_config(parser: ArgumentParser, argv=None) -> Namespace:
    """CLI args merged over the saved run config
    (reference arguments/__init__.py:112-132, JSON instead of eval)."""
    args_cmdline = parser.parse_args(argv)
    merged = {}
    model_path = getattr(args_cmdline, "model_path", None)
    if model_path:
        cfg_json = os.path.join(model_path, "cfg.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                merged.update(json.load(f))
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
