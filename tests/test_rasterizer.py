"""Rasterizer correctness: tile pipeline vs the naive oracle, fwd and bwd."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops.projection import project_gaussians
from gaussianavatars_tpu.ops.rasterize_jnp import rasterize_reference
from gaussianavatars_tpu.ops.rasterize_tiles import rasterize

from .utils import make_camera, make_scene

BG = jnp.asarray([1.0, 1.0, 1.0])


def oracle_render(scene, cam, sh_degree=2, means2d_offset=None):
    proj = project_gaussians(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], sh_degree, cam,
        means2d_offset=means2d_offset,
    )
    return rasterize_reference(proj, cam, BG)


def tile_render(scene, cam, sh_degree=2, means2d_offset=None, **kw):
    kw.setdefault("capacity", 4096)
    kw.setdefault("tile_size", 16)
    kw.setdefault("chunk", 8)
    out = rasterize(
        scene["means3d"], scene["scales"], scene["quats"],
        scene["opacities"], scene["shs"], sh_degree, cam, BG,
        means2d_offset=means2d_offset, **kw,
    )
    return out


class TestForwardParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tile_matches_oracle(self, seed):
        cam = make_camera(width=48, height=40)
        scene = make_scene(n=80, seed=seed)
        img_oracle = np.asarray(oracle_render(scene, cam))
        out = tile_render(scene, cam)
        assert int(out.instance_total) <= 4096
        np.testing.assert_allclose(
            np.asarray(out.image), img_oracle, atol=2e-5, rtol=1e-4
        )

    def test_odd_image_size_and_tiles(self):
        cam = make_camera(width=37, height=29)
        scene = make_scene(n=50, seed=3)
        img_oracle = np.asarray(oracle_render(scene, cam))
        out = tile_render(scene, cam, tile_size=16, chunk=4)
        np.testing.assert_allclose(
            np.asarray(out.image), img_oracle, atol=2e-5, rtol=1e-4
        )

    def test_saturating_opacity_early_out(self):
        # Dense, opaque scene drives T below 1e-4 -> exercises the early-out
        cam = make_camera(width=32, height=32)
        scene = make_scene(n=256, seed=4, spread=0.2, scale_mean=-1.2)
        scene["opacities"] = jnp.full_like(scene["opacities"], 0.995)
        img_oracle = np.asarray(oracle_render(scene, cam))
        out = tile_render(scene, cam, capacity=16384)
        assert int(out.instance_total) <= 16384
        np.testing.assert_allclose(
            np.asarray(out.image), img_oracle, atol=3e-5, rtol=1e-4
        )
        # background must be invisible where saturated; the early-out clamps
        # T just above 1e-4 rather than below it
        assert float(out.transmittance.min()) < 5e-4

    def test_empty_scene_gives_background(self):
        cam = make_camera(width=24, height=16)
        scene = make_scene(n=4, seed=5)
        scene["means3d"] = scene["means3d"] + 100.0  # push off-screen
        out = tile_render(scene, cam)
        np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-6)


class TestFlatShParity:
    def test_flat_cmajor_shs_match_3d(self):
        """rasterize() with the production flat channel-major SH layout
        == the [N, K, 3] reference-API path, for image and grads."""
        from gaussianavatars_tpu.ops.sh import flat_cmajor_from_kc

        scene = make_scene(seed=3, n=80)
        cam = make_camera(width=64, height=48)
        flat = dict(scene, shs=flat_cmajor_from_kc(scene["shs"]))

        img3 = tile_render(scene, cam).image
        img2 = tile_render(flat, cam).image
        np.testing.assert_allclose(np.asarray(img2), np.asarray(img3),
                                   atol=1e-6)

        def loss(shs, scene):
            return jnp.sum(tile_render(dict(scene, shs=shs), cam).image ** 2)

        g3 = jax.grad(loss)(scene["shs"], scene)
        g2 = jax.grad(loss)(flat["shs"], flat)
        np.testing.assert_allclose(
            np.asarray(flat_cmajor_from_kc(g3)), np.asarray(g2), atol=2e-5)


class TestBackwardParity:
    def _loss_fns(self, cam, sh_degree=2):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (3, cam.height, cam.width), dtype=jnp.float32)

        def loss_oracle(scene, off):
            img = oracle_render(scene, cam, sh_degree, means2d_offset=off)
            return jnp.sum(img * w)

        def loss_tile(scene, off):
            out = tile_render(scene, cam, sh_degree, means2d_offset=off)
            return jnp.sum(out.image * w)

        return loss_oracle, loss_tile

    def test_grads_match_oracle(self):
        cam = make_camera(width=48, height=40)
        scene = make_scene(n=60, seed=7)
        off = jnp.zeros((60, 2), dtype=jnp.float32)
        loss_oracle, loss_tile = self._loss_fns(cam)

        g_o = jax.grad(loss_oracle, argnums=(0, 1))(scene, off)
        g_t = jax.grad(loss_tile, argnums=(0, 1))(scene, off)

        for kname in ["means3d", "scales", "quats", "opacities", "shs"]:
            a, b = np.asarray(g_o[0][kname]), np.asarray(g_t[0][kname])
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-4, err_msg=kname
            )
        # densification signal (NDC-space means2d gradient)
        a, b = np.asarray(g_o[1]), np.asarray(g_t[1])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)
        assert np.abs(a).max() > 0.0  # signal actually exists

    def test_oracle_grads_vs_finite_difference(self):
        cam = make_camera(width=24, height=20)
        scene = make_scene(n=12, seed=8)
        off = jnp.zeros((12, 2), dtype=jnp.float32)
        loss_oracle, _ = self._loss_fns(cam)

        g = jax.grad(lambda s: loss_oracle(s, off))(scene)
        eps = 1e-3
        rng = np.random.default_rng(0)
        for kname in ["means3d", "opacities"]:
            arr = np.asarray(scene[kname])
            flat_idx = rng.integers(0, arr.size, size=4)
            for fi in flat_idx:
                idx = np.unravel_index(fi, arr.shape)
                pert = arr.copy()
                pert[idx] += eps
                lp = float(loss_oracle({**scene, kname: jnp.asarray(pert)}, off))
                pert[idx] -= 2 * eps
                lm = float(loss_oracle({**scene, kname: jnp.asarray(pert)}, off))
                fd = (lp - lm) / (2 * eps)
                an = float(np.asarray(g[kname])[idx])
                assert abs(fd - an) < 2e-2 * max(1.0, abs(fd)), (kname, idx, fd, an)

    def test_grads_with_early_out(self):
        cam = make_camera(width=32, height=32)
        scene = make_scene(n=128, seed=9, spread=0.2, scale_mean=-1.2)
        scene["opacities"] = jnp.full_like(scene["opacities"], 0.995)
        off = jnp.zeros((128, 2), dtype=jnp.float32)
        loss_oracle, loss_tile = self._loss_fns(cam)
        g_o = jax.grad(loss_oracle)(scene, off)
        g_t = jax.grad(loss_tile)(scene, off)
        for kname in ["means3d", "scales", "opacities"]:
            a, b = np.asarray(g_o[kname]), np.asarray(g_t[kname])
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-3, err_msg=kname)


class TestBinning:
    def test_total_counts_match_rect_areas(self):
        from gaussianavatars_tpu.ops.binning import bin_gaussians

        cam = make_camera(width=64, height=48)
        scene = make_scene(n=40, seed=10)
        proj = project_gaussians(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 2, cam,
        )
        b = bin_gaussians(
            proj.means2d, proj.depths, proj.radii, proj.valid,
            cam.width, cam.height, 16, 4096,
        )
        # every tile range is sorted by depth
        ids = np.asarray(b.gaussian_ids)
        depths = np.asarray(proj.depths)
        starts, ends = np.asarray(b.tile_starts), np.asarray(b.tile_ends)
        total = int(b.total)
        assert total == int(ends[-1])
        for t in range(len(starts)):
            seg = ids[starts[t]:ends[t]]
            d = depths[seg]
            assert (np.diff(d) >= 0).all()


class TestPythonPaths:
    """Debug pipeline flags: precomputed covariance / SH colors must match
    the in-rasterizer paths (reference gaussian_renderer/__init__.py:63-81)."""

    def test_cov3d_and_colors_precomp_match(self):
        from gaussianavatars_tpu.ops.covariance import build_covariance_3d
        from gaussianavatars_tpu.ops.sh import eval_sh

        cam = make_camera(width=48, height=40)
        scene = make_scene(n=40, seed=11)
        base = tile_render(scene, cam)

        cov3d = build_covariance_3d(scene["scales"], scene["quats"])
        out_cov = rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 2, cam, BG,
            capacity=4096, tile_size=16, chunk=8,
            cov3d_precomp=cov3d,
        )
        np.testing.assert_allclose(
            np.asarray(out_cov.image), np.asarray(base.image), atol=1e-5
        )

        dirs = scene["means3d"] - cam.campos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        colors = jnp.maximum(
            eval_sh(2, jnp.swapaxes(scene["shs"], -1, -2), dirs) + 0.5, 0.0
        )
        out_col = rasterize(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 2, cam, BG,
            capacity=4096, tile_size=16, chunk=8,
            colors_precomp=colors,
        )
        np.testing.assert_allclose(
            np.asarray(out_col.image), np.asarray(base.image), atol=1e-5
        )


class TestTile32:
    """tile_size is a pure performance knob: output must be identical."""

    def test_tile32_matches_oracle(self):
        cam = make_camera(width=48, height=40)
        scene = make_scene(n=80, seed=1)
        img_oracle = np.asarray(oracle_render(scene, cam))
        out = tile_render(scene, cam, tile_size=32, chunk=8)
        np.testing.assert_allclose(
            np.asarray(out.image), img_oracle, atol=2e-5, rtol=1e-4
        )

    def test_tile32_grads_match(self):
        cam = make_camera(width=48, height=40)
        scene = make_scene(n=60, seed=7)
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 40, 48))

        def loss(scene, ts):
            out = tile_render(scene, cam, tile_size=ts, chunk=8)
            return jnp.sum(out.image * w)

        g16 = jax.grad(lambda s: loss(s, 16))(scene)
        g32 = jax.grad(lambda s: loss(s, 32))(scene)
        for k in scene:
            a, b = np.asarray(g16[k]), np.asarray(g32[k])
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                       err_msg=k)


class TestDenseBinning:
    """Multi-level dense binning (ops/binning_dense.py) vs the sort path."""

    def test_dense_image_matches_sort(self):
        cam = make_camera(width=48, height=32, fovx=0.8, dist=3.5)
        scene = make_scene(n=80, seed=5, sh_degree=1, spread=1.2)
        o1 = tile_render(scene, cam, sh_degree=1)
        o2 = tile_render(scene, cam, sh_degree=1, binning_impl="dense")
        assert int(o2.rect_overflow) == 0
        np.testing.assert_allclose(o1.image, o2.image, atol=1e-5)

    def test_dense_grads_match_sort(self):
        cam = make_camera(width=48, height=32, fovx=0.8, dist=3.5)
        scene = make_scene(n=60, seed=7, sh_degree=1, spread=1.2)
        w = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 32, 48)).astype(np.float32)
        )

        def loss(impl):
            def f(params):
                s = dict(scene, **params)
                return jnp.sum(tile_render(s, cam, sh_degree=1,
                                           binning_impl=impl).image * w)
            return f

        params = {k: scene[k] for k in
                  ("means3d", "scales", "quats", "opacities", "shs")}
        g1 = jax.grad(loss("sort"))(params)
        g2 = jax.grad(loss("dense"))(params)
        for k in params:
            np.testing.assert_allclose(g1[k], g2[k], atol=1e-4, rtol=1e-4)

    def test_dense_bucket_overflow_probe(self):
        from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense

        cam = make_camera(width=48, height=32, fovx=0.8, dist=3.5)
        scene = make_scene(n=60, seed=7, sh_degree=1, spread=1.2)
        # force everything past level 0 with a tiny bucket
        out = tile_render(scene, cam, sh_degree=1, binning_impl="dense",
                          levels=((1, 1, None), (3, 2, 4)))
        assert int(out.rect_overflow) > 0

    def test_dense_exactness_assertion(self):
        cam = make_camera(width=48, height=32, fovx=0.8, dist=3.5)
        scene = make_scene(n=8, seed=0, sh_degree=1)
        with pytest.raises(AssertionError, match="cover the full tile grid"):
            tile_render(scene, cam, sh_degree=1, binning_impl="dense",
                        levels=((1, 1, None), (2, 2, 4)))

    def test_dense_rank_live_counts_match_stream(self):
        """rank_live_counts (which drives the gather-based gradient
        reduction) must equal the histogram of live stream ranks."""
        from gaussianavatars_tpu.ops.binning_dense import bin_gaussians_dense
        from gaussianavatars_tpu.ops.projection import project_gaussians

        cam = make_camera(width=64, height=48, fovx=0.8, dist=3.5)
        scene = make_scene(n=300, seed=11, sh_degree=1, spread=1.0)
        proj = project_gaussians(
            scene["means3d"], scene["scales"], scene["quats"],
            scene["opacities"], scene["shs"], 1, cam)
        b = bin_gaussians_dense(
            proj.means2d, proj.depths, proj.radii, proj.valid,
            cam.width, cam.height, 16,
            means2d_cull=proj.means2d, r2_max=proj.r2_max)
        ranks = np.asarray(b.ranks)
        valid = np.asarray(b.instance_valid)
        hist = np.bincount(ranks[valid], minlength=300)
        np.testing.assert_array_equal(
            np.asarray(b.rank_live_counts), hist)
        assert hist.sum() == int(b.total)

    def test_gather_perm_reduction_paths_agree(self):
        """The pair-sort + segmented-scan cotangent reduction must equal
        the scatter-add fallback exactly (same additions, different
        order -> allclose)."""
        from gaussianavatars_tpu.ops.instance_pack import (
            gather_instances_perm,
        )

        rng = np.random.default_rng(5)
        n, cap = 50, 256
        pack = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
        counts = rng.integers(0, 9, n).astype(np.int32)
        total = int(counts.sum())
        assert total <= cap
        ranks = np.repeat(np.arange(n), counts)
        # stream order: tile-major (here: shuffled segments), live prefix
        order = rng.permutation(total)
        ranks_stream = np.full(cap, 0, np.int32)
        ranks_stream[:total] = ranks[order]
        valid = np.zeros(cap, bool)
        valid[:total] = True
        # counts must describe the live stream
        counts_live = np.bincount(ranks_stream[:total], minlength=n)

        # the contract: grads past the live prefix are exact zeros (the
        # blend backward zero-fills past coverage) and pack rows 9:16 are
        # structural zero padding (the fast reduction only scans the 9
        # live rows)
        g = rng.normal(size=(16, cap)).astype(np.float32)
        g[:, total:] = 0.0
        g[9:] = 0.0
        g = jnp.asarray(g)

        def run(rank_counts):
            def f(pk):
                out = gather_instances_perm(
                    pk, jnp.asarray(ranks_stream), jnp.asarray(valid),
                    cap, rank_counts, 16)
                return jnp.sum(out * g)
            return np.asarray(jax.grad(f)(pack))

        d_scatter = run(None)
        d_gather = run(jnp.asarray(counts_live))
        np.testing.assert_allclose(d_gather, d_scatter, atol=1e-5)
