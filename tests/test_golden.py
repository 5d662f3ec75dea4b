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
