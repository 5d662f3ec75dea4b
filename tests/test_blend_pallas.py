"""Pallas blend kernels vs the jnp blueprint (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

from .utils import make_camera, make_scene

BG = jnp.asarray([0.2, 0.5, 0.8])


def render(scene, cam, backend, capacity=2048, chunk=8):
    return rasterize(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], 2, cam, BG,
        capacity=capacity, tile_size=16, chunk=chunk, backend=backend,
    )


@pytest.mark.parametrize("seed", [0, 4])
def test_forward_matches_jnp(seed):
    cam = make_camera(width=48, height=40)
    scene = make_scene(n=60, seed=seed)
    out_j = render(scene, cam, "jnp")
    out_p = render(scene, cam, "pallas")
    assert int(out_p.instance_total) <= 2048
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_j.image), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.transmittance), np.asarray(out_j.transmittance),
        atol=1e-5, rtol=1e-5,
    )


def test_backward_matches_jnp():
    cam = make_camera(width=32, height=32)
    scene = make_scene(n=48, seed=1)
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32), dtype=jnp.float32)

    def loss(scene, backend):
        out = render(scene, cam, backend)
        return jnp.sum(out.image * w) + 0.3 * jnp.sum(out.transmittance**2)

    g_j = jax.grad(lambda s: loss(s, "jnp"))(scene)
    g_p = jax.grad(lambda s: loss(s, "pallas"))(scene)
    for k in ["means3d", "scales", "quats", "opacities", "shs"]:
        a, b = np.asarray(g_j[k]), np.asarray(g_p[k])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4, err_msg=k)


def test_backward_early_out_matches_jnp():
    cam = make_camera(width=32, height=32)
    scene = make_scene(n=128, seed=9, spread=0.2, scale_mean=-1.2)
    scene["opacities"] = jnp.full_like(scene["opacities"], 0.995)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32), dtype=jnp.float32)

    def loss(scene, backend):
        out = render(scene, cam, backend, capacity=4096)
        return jnp.sum(out.image * w)

    g_j = jax.grad(lambda s: loss(s, "jnp"))(scene)
    g_p = jax.grad(lambda s: loss(s, "pallas"))(scene)
    for k in ["means3d", "opacities", "scales"]:
        a, b = np.asarray(g_j[k]), np.asarray(g_p[k])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4, err_msg=k)
