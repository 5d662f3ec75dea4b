#!/usr/bin/env python3
"""Regenerate the golden render fixtures (run from the repo root).

Two fixtures (VERDICT r4 weak #6: one tiny jnp image was the only golden):

  render_48x40_seed0.npz        48x40, 80 gaussians, jnp backend
  render_160x120_seed3.npz      160x120, 1024 gaussians with deliberately
                                mixed-depth stacks (three depth shells +
                                high opacity so per-pixel blend order and
                                the T<eps termination path both matter),
                                PALLAS backend (interpret mode off-TPU —
                                same kernel code path the TPU runs)

Goldens are generated on the CPU backend so any machine reproduces them
bit-identically; the tests compare both backends against the files.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")   # the axon TPU plugin ignores
                                            # the JAX_PLATFORMS env var

import numpy as np


def big_scene(n=1024, seed=3, sh_degree=2):
    """Mixed-depth stacked cloud: three depth shells of splats aimed at
    the same screen region, sized so tiles hold deep overlapping stacks
    (exercises blend order, termination, and multi-chunk tile ranges)."""
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    k = (sh_degree + 1) ** 2
    shell = rng.integers(0, 3, n)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
    means[:, 2] += shell * 0.25              # three depth planes
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    sh = rng.normal(size=(n, k, 3)).astype(np.float32) * 0.3
    sh[:, 0] += 0.8
    return dict(
        means3d=jnp.asarray(means),
        scales=jnp.asarray(np.exp(
            rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 2.0)),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(
            rng.uniform(0.55, 0.98, size=(n,)).astype(np.float32)),
        shs=jnp.asarray(sh),
    )


def main():
    from tests.utils import make_camera, make_scene
    from gaussianavatars_tpu.ops.rasterize_tiles import rasterize
    import jax.numpy as jnp

    here = os.path.dirname(os.path.abspath(__file__))

    cam = make_camera(width=48, height=40)
    scene = make_scene(n=80, seed=0)
    out = rasterize(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], 2, cam, jnp.ones(3),
        capacity=4096, tile_size=32, chunk=8, backend="jnp",
    )
    np.savez(os.path.join(here, "render_48x40_seed0.npz"),
             image=np.asarray(out.image))
    print("wrote render_48x40_seed0.npz")

    cam = make_camera(width=160, height=120, fovx=0.6, dist=1.2)
    scene = big_scene()
    out = rasterize(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], 2, cam, jnp.ones(3),
        capacity=65536, tile_size=32, chunk=128, backend="pallas",
        binning_impl="dense",
    )
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    np.savez(os.path.join(here, "render_160x120_seed3.npz"), image=img)
    print(f"wrote render_160x120_seed3.npz "
          f"(instances={int(out.instance_total)})")


if __name__ == "__main__":
    main()
