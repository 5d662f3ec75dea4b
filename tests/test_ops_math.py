"""Unit tests for the core math ops against independent references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops import (
    build_covariance_3d,
    compute_face_orientation,
    eval_sh,
    focal2fov,
    fov2focal,
    perspective_projection,
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
    rgb2sh,
    rotmat_to_quat,
    sh2rgb,
    strip_symmetric,
    world_to_view,
)
from gaussianavatars_tpu.ops.ssim import ssim
from gaussianavatars_tpu.utils.image import psnr
from gaussianavatars_tpu.utils.schedules import expon_lr


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


class TestSH:
    def test_degree0_is_constant(self):
        sh = rand(0, 5, 3, 16)
        dirs = quat_like_dirs(1, 5)
        out = eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, 0.28209479177387814 * sh[..., 0], rtol=1e-6)

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_matches_scipy_sph_harm(self, deg):
        """Real SH from our hardcoded polys vs scipy's complex Y_lm."""
        from scipy.special import sph_harm_y

        n = 64
        dirs = np.asarray(quat_like_dirs(2, n))
        x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
        theta = np.arccos(np.clip(z, -1, 1))        # polar
        phi = np.arctan2(y, x)                       # azimuth

        k = (deg + 1) ** 2
        # one-hot each coefficient; compare against real SH built from scipy
        for l in range(deg + 1):
            for m in range(-l, l + 1):
                idx = l * l + l + m
                sh = np.zeros((n, 1, k), dtype=np.float32)
                sh[:, 0, idx] = 1.0
                ours = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))[:, 0]

                ylm = sph_harm_y(l, abs(m), theta, phi)
                if m > 0:
                    ref = np.sqrt(2.0) * (-1.0) ** m * ylm.real
                elif m < 0:
                    ref = np.sqrt(2.0) * (-1.0) ** m * ylm.imag
                else:
                    ref = ylm.real
                # The 3DGS convention flips sign for odd m vs the CS phase.
                # Establish per-(l,m) sign empirically on the first sample,
                # then require it to be consistent across all samples.
                denom = np.where(np.abs(ref) > 1e-6, ref, 1.0)
                ratio = ours / denom
                good = np.abs(ref) > 1e-4
                if good.sum() < 4:
                    continue
                r = ratio[good]
                assert np.allclose(np.abs(r), 1.0, atol=2e-4), (l, m, r[:4])
                assert np.allclose(r, r[0], atol=2e-4), (l, m)

    @pytest.mark.parametrize("deg,k", [(0, 1), (1, 4), (2, 16), (3, 16), (4, 25)])
    def test_eval_sh_kc_custom_vjp_matches_autodiff(self, deg, k):
        """The hand VJP of eval_sh_kc (ops/sh.py) == autodiff of eval_sh,
        for both the coefficient and the view-direction cotangents."""
        from gaussianavatars_tpu.ops.sh import eval_sh_kc

        sh = rand(10, 40, k, 3)
        dirs = quat_like_dirs(11, 40)
        g = rand(12, 40, 3)

        out_ref = eval_sh(deg, jnp.swapaxes(sh, -1, -2), dirs)
        out_new = eval_sh_kc(deg, sh, dirs)
        np.testing.assert_allclose(out_new, out_ref, atol=1e-6)

        f_ref = lambda s, d: jnp.sum(
            eval_sh(deg, jnp.swapaxes(s, -1, -2), d) * g)
        f_new = lambda s, d: jnp.sum(eval_sh_kc(deg, s, d) * g)
        g_ref = jax.grad(f_ref, argnums=(0, 1))(sh, dirs)
        g_new = jax.grad(f_new, argnums=(0, 1))(sh, dirs)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(a, b, atol=2e-5)

    @pytest.mark.parametrize("deg,k", [(0, 1), (2, 16), (3, 16), (4, 25)])
    def test_eval_sh_flat_matches_autodiff(self, deg, k):
        """The 2D hot-path variant (ops/sh.py eval_sh_flat) == autodiff of
        eval_sh for value, coefficient grads, and direction grads."""
        from gaussianavatars_tpu.ops.sh import eval_sh_flat

        sh2 = rand(20, 40, k * 3)
        dirs = quat_like_dirs(21, 40)
        g = rand(22, 40, 3)

        as_kc = lambda s: jnp.swapaxes(s.reshape(40, k, 3), -1, -2)
        np.testing.assert_allclose(
            eval_sh_flat(deg, sh2, dirs), eval_sh(deg, as_kc(sh2), dirs),
            atol=1e-6)
        g_ref = jax.grad(
            lambda s, d: jnp.sum(eval_sh(deg, as_kc(s), d) * g),
            argnums=(0, 1))(sh2, dirs)
        g_new = jax.grad(
            lambda s, d: jnp.sum(eval_sh_flat(deg, s, d) * g),
            argnums=(0, 1))(sh2, dirs)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(a, b, atol=2e-5)

    @pytest.mark.parametrize("deg,k", [(0, 1), (2, 16), (3, 16), (4, 25)])
    def test_eval_sh_flat_cmajor_matches_autodiff(self, deg, k):
        """The channel-major flat variant (the production layout,
        ops/sh.py eval_sh_flat_cmajor) == autodiff of eval_sh for value,
        coefficient grads, and direction grads."""
        from gaussianavatars_tpu.ops.sh import eval_sh_flat_cmajor

        sh2c = rand(30, 40, 3 * k)
        dirs = quat_like_dirs(31, 40)
        g = rand(32, 40, 3)

        # c-major flat [N, 3K] -> [N, 3, K]: channel axis at -2 = eval_sh's
        as_ck = lambda s: s.reshape(40, 3, k)
        np.testing.assert_allclose(
            eval_sh_flat_cmajor(deg, sh2c, dirs),
            eval_sh(deg, as_ck(sh2c), dirs), atol=1e-6)
        g_ref = jax.grad(
            lambda s, d: jnp.sum(eval_sh(deg, as_ck(s), d) * g),
            argnums=(0, 1))(sh2c, dirs)
        g_new = jax.grad(
            lambda s, d: jnp.sum(eval_sh_flat_cmajor(deg, s, d) * g),
            argnums=(0, 1))(sh2c, dirs)
        for a, b in zip(g_new, g_ref):
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_flat_cmajor_roundtrip(self):
        from gaussianavatars_tpu.ops.sh import (
            flat_cmajor_from_kc, kc_from_flat_cmajor,
        )

        sh3 = rand(33, 12, 16, 3)
        flat = flat_cmajor_from_kc(sh3)
        assert flat.shape == (12, 48)
        # block c holds channel c's coefficients in k order
        np.testing.assert_array_equal(np.asarray(flat[:, 16:32]),
                                      np.asarray(sh3[:, :, 1]))
        np.testing.assert_array_equal(np.asarray(kc_from_flat_cmajor(flat)),
                                      np.asarray(sh3))

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray(
            np.random.default_rng(0).random((10, 3)).astype(np.float32))
        np.testing.assert_allclose(sh2rgb(rgb2sh(rgb)), rgb, atol=2e-7)


def quat_like_dirs(key, n):
    v = jax.random.normal(jax.random.PRNGKey(key), (n, 3), dtype=jnp.float32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestQuaternion:
    def test_product_composes_rotations(self):
        a = quat_normalize(rand(3, 16, 4))
        b = quat_normalize(rand(4, 16, 4))
        lhs = quat_to_rotmat(quat_multiply(a, b))
        rhs = jnp.einsum(
            "nij,njk->nik", quat_to_rotmat(a), quat_to_rotmat(b),
            precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_rotmat_quat_roundtrip(self):
        q = quat_normalize(rand(5, 256, 4))
        m = quat_to_rotmat(q)
        q2 = rotmat_to_quat(m)
        m2 = quat_to_rotmat(q2)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_against_scipy(self):
        from scipy.spatial.transform import Rotation

        qwxyz = np.asarray(quat_normalize(rand(6, 32, 4)))
        ours = np.asarray(quat_to_rotmat(jnp.asarray(qwxyz)))
        theirs = Rotation.from_quat(qwxyz[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestCovariance:
    def test_psd_and_scale(self):
        scales = jnp.exp(rand(7, 32, 3) * 0.3)
        quats = quat_normalize(rand(8, 32, 4))
        cov = build_covariance_3d(scales, quats)
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(
            np.sort(eig, -1), np.sort(np.asarray(scales) ** 2, -1), rtol=1e-4
        )

    def test_strip(self):
        scales = jnp.exp(rand(9, 4, 3))
        quats = quat_normalize(rand(10, 4, 4))
        cov = build_covariance_3d(scales, quats)
        packed = strip_symmetric(cov)
        assert packed.shape == (4, 6)
        np.testing.assert_allclose(packed[:, 0], cov[:, 0, 0])
        np.testing.assert_allclose(packed[:, 4], cov[:, 1, 2])


class TestCameraMath:
    def test_fov_focal_roundtrip(self):
        assert abs(focal2fov(fov2focal(0.9, 800), 800) - 0.9) < 1e-9

    def test_world_to_view_inverse(self):
        from scipy.spatial.transform import Rotation

        R = Rotation.random(random_state=0).as_matrix()
        t = np.array([0.3, -0.2, 1.5])
        W = world_to_view(R, t)  # transposed storage
        # camera center must map to origin
        c = np.linalg.inv(W)[3, :3]
        p = np.concatenate([c, [1.0]]) @ W
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_projection_maps_frustum(self):
        znear, zfar = 0.01, 100.0
        fovx = fovy = 2 * np.arctan(0.5)
        P = perspective_projection(znear, zfar, fovx, fovy)
        # a point on the +x frustum boundary at depth z maps to ndc x=1
        z = 3.0
        p = np.array([np.tan(fovx / 2) * z, 0, z, 1.0]) @ P
        assert abs(p[0] / p[3] - 1.0) < 1e-5
        # w equals view z
        assert abs(p[3] - z) < 1e-6


class TestFaceOrientation:
    def test_orthonormal_frame(self):
        verts = rand(11, 30, 3)
        f = np.random.default_rng(0).integers(0, 30, (80, 3))
        f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
        faces = jnp.asarray(f[:50], dtype=jnp.int32)
        orient, scale = compute_face_orientation(verts, faces)
        eye = jnp.eye(3)[None]
        gram = jnp.swapaxes(orient, -1, -2) @ orient
        np.testing.assert_allclose(gram, np.broadcast_to(eye, gram.shape), atol=1e-4)
        # right-handed: det = +1
        np.testing.assert_allclose(np.linalg.det(np.asarray(orient)), 1.0, atol=1e-4)
        assert (np.asarray(scale) > 0).all()

    def test_scale_formula(self):
        # Right triangle in the xy plane: v0=(0,0,0), v1=(2,0,0), v2=(0,3,0)
        verts = jnp.asarray([[0, 0, 0], [2, 0, 0], [0, 3, 0]], dtype=jnp.float32)
        faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
        orient, scale = compute_face_orientation(verts, faces)
        # a0 = x, a1 = cross(x, v2-v0) = z*... -> scale = (|e01| + |a2.e02|)/2
        np.testing.assert_allclose(scale[0, 0], (2.0 + 3.0) / 2.0, rtol=1e-5)


class TestSchedule:
    def test_endpoints(self):
        assert abs(expon_lr(0, 1e-2, 1e-4, max_steps=100) - 1e-2) < 1e-9
        assert abs(expon_lr(100, 1e-2, 1e-4, max_steps=100) - 1e-4) < 1e-9

    def test_delay(self):
        v = expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.01,
                     max_steps=100)
        assert abs(v - 1e-4) < 1e-6  # 0.01 * lr_init at step 0

    def test_negative_step_disabled(self):
        assert expon_lr(-1, 1e-2, 1e-4) == 0.0


class TestImageMetrics:
    def test_psnr_identity(self):
        img = jnp.asarray(np.random.rand(3, 16, 16).astype(np.float32))
        assert float(psnr(img, img)[0]) > 80.0

    def test_ssim_identity_and_range(self):
        img = jnp.asarray(np.random.rand(3, 32, 32).astype(np.float32))
        assert abs(float(ssim(img, img)) - 1.0) < 1e-5
        other = jnp.asarray(np.random.rand(3, 32, 32).astype(np.float32))
        val = float(ssim(img, other))
        assert -1.0 <= val < 0.9

    def test_ssim_matches_torch_reference_formula(self):
        """Independent torch implementation of the reference SSIM
        (utils/loss_utils.py:23-63 semantics: 11x11 sigma-1.5 gaussian
        window, zero-padded depthwise conv, C1=0.01^2, C2=0.03^2)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        a = rng.random((3, 64, 64)).astype(np.float32)
        b = np.clip(a + 0.1 * rng.random((3, 64, 64)).astype(np.float32), 0, 1)

        xs = np.arange(11) - 5
        g = np.exp(-(xs**2) / (2 * 1.5**2)).astype(np.float32)
        g /= g.sum()
        win = torch.from_numpy(np.outer(g, g).astype(np.float32))
        win = win.expand(3, 1, 11, 11)

        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]

        def filt(x):
            return F.conv2d(x, win, padding=5, groups=3)

        mu1, mu2 = filt(ta), filt(tb)
        s1 = filt(ta * ta) - mu1**2
        s2 = filt(tb * tb) - mu2**2
        s12 = filt(ta * tb) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
               / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))).mean().item()

        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ours - ref) < 1e-5
