"""The train.py CLI end-to-end via subprocess (argparse -> training)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_cli_subprocess(tmp_path):
    from .dataset_fixtures import make_avatar_dataset

    data_dir, asset_dir = make_avatar_dataset(str(tmp_path))
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["FLAME_ASSET_DIR"] = asset_dir
    env["JAX_PLATFORMS"] = "cpu"
    # train.py must honor the CPU request itself in this environment
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import train; train.main()"
    )
    result = subprocess.run(
        [sys.executable, "-c", code,
         "-s", data_dir, "-m", out, "--bind_to_mesh", "--eval",
         "--sh_degree", "1",
         "--iterations", "4", "--interval", "4",
         "--densify_from_iter", "100", "--densify_until_iter", "0",
         "--position_lr_max_steps", "4",
         "--backend", "jnp", "--capacity", "262144", "--chunk", "16",
         "--no_gui", "--quiet"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=500,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "cfg.json"))
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_4", "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "chkpnt4.npz"))
    # end-of-run summary (growth/surgery event counts, final capacities)
    with open(os.path.join(out, "run_summary.json")) as f:
        summary = json.load(f)
    assert summary["iterations"] == 4
    assert summary["n_alive"] > 0
    assert "capacity_growth" in summary["events"]
