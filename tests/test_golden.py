"""Golden-image regression: catches silent renderer drift across versions."""

import os

import numpy as np

from .utils import make_camera, make_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "render_48x40_seed0.npz")


def test_tile_render_matches_golden():
    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
    import jax.numpy as jnp

    cam = make_camera(width=48, height=40)
    scene = make_scene(n=80, seed=0)
    out = rasterize(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], 2, cam, jnp.ones(3),
        capacity=4096, tile_size=32, chunk=8, backend="jnp",
    )
    golden = np.load(GOLDEN)["image"]
    np.testing.assert_allclose(np.asarray(out.image), golden,
                               atol=3e-5, rtol=1e-4)


GOLDEN_BIG = os.path.join(os.path.dirname(__file__), "golden",
                          "render_160x120_seed3.npz")


def test_pallas_render_matches_big_golden():
    """160x120, 1024 gaussians in three overlapping depth shells (~12k
    instances, deep per-tile stacks): the PALLAS kernel path (interpret
    mode off-TPU — the same kernel code the TPU lowers) against the
    checked-in fixture. Regenerate with tests/golden/make_goldens.py."""
    from tests.golden.make_goldens import big_scene
    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
    import jax.numpy as jnp

    cam = make_camera(width=160, height=120, fovx=0.6, dist=1.2)
    scene = big_scene()
    golden = np.load(GOLDEN_BIG)["image"]
    for backend in ("pallas", "jnp"):
        out = rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 2, cam, jnp.ones(3),
            capacity=65536, tile_size=32, chunk=128, backend=backend,
            binning_impl="dense",
        )
        np.testing.assert_allclose(np.asarray(out.image), golden,
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"backend={backend}")
