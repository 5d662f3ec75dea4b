"""Config system: flag parity with the reference CLI, persistence."""

import json
import os
from argparse import ArgumentParser

from gaussianavatars_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    get_combined_config,
    load_config,
    save_config,
)


def test_reference_flag_names_and_defaults():
    parser = ArgumentParser()
    ModelConfig.add_to_parser(parser)
    OptimizationConfig.add_to_parser(parser)
    PipelineConfig.add_to_parser(parser)
    args = parser.parse_args([
        "-s", "/data", "-m", "/out", "--bind_to_mesh", "--eval",
        "--iterations", "1000", "--lambda_dssim", "0.3",
    ])
    m = ModelConfig.extract(args)
    o = OptimizationConfig.extract(args)
    assert m.source_path == "/data"
    assert m.model_path == "/out"
    assert m.bind_to_mesh and m.eval
    assert o.iterations == 1000
    assert abs(o.lambda_dssim - 0.3) < 1e-9
    # reference defaults (arguments/__init__.py:76-110)
    assert o.position_lr_init == 0.005
    assert o.scaling_lr == 0.017
    assert o.densification_interval == 2000
    assert o.opacity_reset_interval == 60000
    assert o.flame_expr_lr == 1e-3
    assert o.threshold_scale == 0.6
    assert m.sh_degree == 3


def test_save_load_and_combined(tmp_path):
    out = str(tmp_path / "run")
    cfg = ModelConfig(source_path="/data", model_path=out, bind_to_mesh=True)
    save_config(out, cfg)
    assert os.path.exists(os.path.join(out, "cfg.json"))
    assert os.path.exists(os.path.join(out, "cfg_args"))  # compat file
    cfg2 = load_config(out)
    assert cfg2.bind_to_mesh and cfg2.source_path == "/data"

    # sentinel parse merges saved config under CLI overrides
    parser = ArgumentParser()
    ModelConfig.add_to_parser(parser, sentinel=True)
    merged = get_combined_config(parser, ["-m", out, "--sh_degree", "2"])
    assert merged.bind_to_mesh is True      # from saved config
    assert merged.sh_degree == 2            # CLI override


def test_ply_attribute_order(tmp_path):
    """The PLY column order must match the reference exactly
    (scene/gaussian_model.py:236-251) for artifact interchange."""
    import numpy as np

    from gaussianavatars_tpu.models.gaussians import GaussianModel
    from gaussianavatars_tpu.utils.ply import read_ply

    m = GaussianModel(sh_degree=2, capacity_granularity=64)
    rng = np.random.default_rng(0)
    m.binding = rng.integers(0, 10, 20).astype(np.int32)
    m.binding_counter = np.bincount(m.binding, minlength=10).astype(np.int32)
    m.create_from_pcd(None, None, 1.0)
    path = str(tmp_path / "pc.ply")
    m.save_ply(path)

    with open(path, "rb") as f:
        header = []
        for line in f:
            header.append(line.decode().strip())
            if line.strip() == b"end_header":
                break
    props = [l.split()[-1] for l in header if l.startswith("property")]
    k = 9  # sh_degree 2 -> 9 coeffs, 8 rest
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * (k - 1))]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
        + ["binding_0"]
    )
    assert props == expected
