"""Real spherical-harmonics evaluation, degrees 0..4.

TPU-native re-implementation of the SH math used by the reference splat
renderer (reference: utils/sh_utils.py:57-118 and the SH stage inside the
CUDA rasterizer, gaussian_renderer/__init__.py:74-79). Written as a single
vectorized jnp expression so XLA fuses it into the projection pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Normalization constants for the real SH basis (standard values, also used
# by PlenOctrees / 3DGS).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded color along unit directions.

    Args:
      degree: static int in [0, 4]; only the first (degree+1)^2 coefficients
        are read (mirrors reference utils/sh_utils.py:57 contract).
      sh: [..., C, K] coefficients with K >= (degree+1)^2.
      dirs: [..., 3] unit directions (broadcast against sh's batch dims).

    Returns:
      [..., C] evaluated values (no +0.5 shift / clamp — callers apply it,
      matching gaussian_renderer/__init__.py:79).
    """
    assert 0 <= degree <= 4
    result = _C0 * sh[..., 0]
    if degree > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - _C1 * y * sh[..., 1] + _C1 * z * sh[..., 2] - _C1 * x * sh[..., 3]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + _C2[0] * xy * sh[..., 4]
                + _C2[1] * yz * sh[..., 5]
                + _C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                + _C2[3] * xz * sh[..., 7]
                + _C2[4] * (xx - yy) * sh[..., 8]
            )
            if degree > 2:
                result = (
                    result
                    + _C3[0] * y * (3.0 * xx - yy) * sh[..., 9]
                    + _C3[1] * xy * z * sh[..., 10]
                    + _C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11]
                    + _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12]
                    + _C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13]
                    + _C3[5] * z * (xx - yy) * sh[..., 14]
                    + _C3[6] * x * (xx - 3.0 * yy) * sh[..., 15]
                )
                if degree > 3:
                    result = (
                        result
                        + _C4[0] * xy * (xx - yy) * sh[..., 16]
                        + _C4[1] * yz * (3.0 * xx - yy) * sh[..., 17]
                        + _C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18]
                        + _C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19]
                        + _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20]
                        + _C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21]
                        + _C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22]
                        + _C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23]
                        + _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)) * sh[..., 24]
                    )
    return result


def sh_basis(degree: int, dirs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Real SH basis values [..., k] along unit directions.

    Coefficients beyond (degree+1)^2 are zero (inactive under SH warmup).
    Same constants/ordering as `eval_sh`, so eval_sh_kc(deg, sh, dirs) ==
    sum_k sh_basis(deg, dirs, K)[..., k, None] * sh[..., k, :].
    """
    assert 0 <= degree <= 4
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    one = jnp.ones_like(x)
    cols = [_C0 * one]
    if degree > 0:
        cols += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 2:
        cols += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree > 3:
        cols += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    cols = cols[:k]
    if len(cols) < k:
        zero = jnp.zeros_like(x)
        cols += [zero] * (k - len(cols))
    return jnp.stack(cols, axis=-1)


def _eval_sh_sliced(degree: int, s, dirs: jnp.ndarray) -> jnp.ndarray:
    """Shared unrolled SH sum; `s(k)` returns the [..., 3] k-th coefficient."""
    assert 0 <= degree <= 4
    result = _C0 * s(0)
    if degree > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - _C1 * y * s(1) + _C1 * z * s(2) - _C1 * x * s(3)
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + _C2[0] * xy * s(4)
                + _C2[1] * yz * s(5)
                + _C2[2] * (2.0 * zz - xx - yy) * s(6)
                + _C2[3] * xz * s(7)
                + _C2[4] * (xx - yy) * s(8)
            )
            if degree > 2:
                result = (
                    result
                    + _C3[0] * y * (3.0 * xx - yy) * s(9)
                    + _C3[1] * xy * z * s(10)
                    + _C3[2] * y * (4.0 * zz - xx - yy) * s(11)
                    + _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * s(12)
                    + _C3[4] * x * (4.0 * zz - xx - yy) * s(13)
                    + _C3[5] * z * (xx - yy) * s(14)
                    + _C3[6] * x * (xx - 3.0 * yy) * s(15)
                )
                if degree > 3:
                    result = (
                        result
                        + _C4[0] * xy * (xx - yy) * s(16)
                        + _C4[1] * yz * (3.0 * xx - yy) * s(17)
                        + _C4[2] * xy * (7.0 * zz - 1.0) * s(18)
                        + _C4[3] * yz * (7.0 * zz - 3.0) * s(19)
                        + _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * s(20)
                        + _C4[5] * xz * (7.0 * zz - 3.0) * s(21)
                        + _C4[6] * (xx - yy) * (7.0 * zz - 1.0) * s(22)
                        + _C4[7] * xz * (xx - 3.0 * yy) * s(23)
                        + _C4[8] * (xx * (xx - 3.0 * yy)
                                    - yy * (3.0 * xx - yy)) * s(24)
                    )
    return result


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def eval_sh_kc(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """`eval_sh` over [..., K, C]-laid-out coefficients (K in the MIDDLE).

    Functionally identical to `eval_sh(degree, swapaxes(sh, -1, -2), dirs)`
    but indexes coefficients as contiguous [..., k, :] slices: the
    channel-minor layout matches how SH features are stored, so XLA emits
    no [N, K, C] -> [N, C, K] relayout copy (~1.2 ms at 100k gaussians).

    Custom VJP: autodiff of the unrolled sum builds the [N, K, C] coefficient
    cotangent from K concatenated slices (~3.5 ms of relayout copies at 100k
    gaussians); the hand VJP emits d_sh as ONE fused outer product basis x g
    and routes d_dirs through jax.vjp of the basis polynomial. For the hot
    path prefer `eval_sh_flat`, whose 2D cotangents dodge the [N, K, C]
    layout assignment entirely.
    """
    return _eval_sh_sliced(degree, lambda k: sh[..., k, :], dirs)


def _eval_sh_kc_fwd(degree, sh, dirs):
    return eval_sh_kc(degree, sh, dirs), (sh, dirs)


def _eval_sh_kc_bwd(degree, residuals, g):
    sh, dirs = residuals
    k = sh.shape[-2]
    basis, pull_dirs = jax.vjp(lambda d: sh_basis(degree, d, k), dirs)
    d_sh = basis[..., :, None] * g[..., None, :]
    # d_dirs = sum_k (sh[..., k, :] . g) * d(basis_k)/d(dirs)
    t = jnp.sum(sh * g[..., None, :], axis=-1)
    (d_dirs,) = pull_dirs(t)
    return d_sh.astype(sh.dtype), d_dirs.astype(dirs.dtype)


eval_sh_kc.defvjp(_eval_sh_kc_fwd, _eval_sh_kc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def eval_sh_flat(degree: int, sh2: jnp.ndarray, dirs: jnp.ndarray):
    """SH evaluation over FLAT [..., K*3] coefficients (k-major, c-minor).

    The hot-path variant: every tensor involved (input, output, cotangents)
    is 2D, so XLA's layout assignment has no [N, K, C] permutation choices
    to make — the backward is pure elementwise work (repeat/tile products)
    instead of the ~2.4 ms of {0,1,2}->{2,0,1} relayout copies the 3D
    version costs at 100k gaussians.
    """
    return _eval_sh_sliced(
        degree, lambda k: sh2[..., 3 * k:3 * k + 3], dirs)


def _eval_sh_flat_fwd(degree, sh2, dirs):
    return eval_sh_flat(degree, sh2, dirs), (sh2, dirs)


def _eval_sh_flat_bwd(degree, residuals, g):
    sh2, dirs = residuals
    k = sh2.shape[-1] // 3
    basis, pull_dirs = jax.vjp(lambda d: sh_basis(degree, d, k), dirs)
    # d_sh2[..., 3k+c] = basis_k * g_c  (k-major repeat x channel tile)
    gk = jnp.tile(g, (1,) * (g.ndim - 1) + (k,))
    d_sh2 = jnp.repeat(basis, 3, axis=-1) * gk
    # t_k = sum_c sh2[..., 3k+c] * g_c via three strided lane slices
    prod = sh2 * gk
    t = prod[..., 0::3] + prod[..., 1::3] + prod[..., 2::3]
    (d_dirs,) = pull_dirs(t)
    return d_sh2.astype(sh2.dtype), d_dirs.astype(dirs.dtype)


eval_sh_flat.defvjp(_eval_sh_flat_fwd, _eval_sh_flat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def eval_sh_flat_cmajor(degree: int, sh2c: jnp.ndarray, dirs: jnp.ndarray):
    """SH evaluation over FLAT [..., 3*K] CHANNEL-major coefficients
    ([all K red coeffs | all K green | all K blue]).

    The production layout (models/gaussians.GaussianParams): every slice
    here is a contiguous K-wide block, so the forward is three fused
    multiply+reduce contractions against the basis and the backward is
    three contiguous block writes — none of the 3-wide interleaved slices
    or repeat/strided-slice relayouts the k-major flat layout costs
    (measured ~1.8 ms of the fwd+bwd pipeline at 100k gaussians, deg 3).
    Channel-major is also the reference PLY bit order (f_rest_* columns,
    reference scene/gaussian_model.py:222-233), making PLY IO copy-free.
    """
    k = sh2c.shape[-1] // 3
    basis = sh_basis(degree, dirs, k)
    return jnp.stack(
        [jnp.sum(basis * sh2c[..., c * k:(c + 1) * k], axis=-1)
         for c in range(3)],
        axis=-1,
    )


def _eval_sh_flat_cmajor_fwd(degree, sh2c, dirs):
    return eval_sh_flat_cmajor(degree, sh2c, dirs), (sh2c, dirs)


def _eval_sh_flat_cmajor_bwd(degree, residuals, g):
    sh2c, dirs = residuals
    k = sh2c.shape[-1] // 3
    basis, pull_dirs = jax.vjp(lambda d: sh_basis(degree, d, k), dirs)
    # d_sh2c channel block c = basis * g_c: three contiguous block writes
    d_sh2c = jnp.concatenate(
        [basis * g[..., c:c + 1] for c in range(3)], axis=-1
    )
    # t_k = sum_c sh2c[..., c*K + k] * g_c over contiguous blocks
    t = (sh2c[..., 0:k] * g[..., 0:1]
         + sh2c[..., k:2 * k] * g[..., 1:2]
         + sh2c[..., 2 * k:3 * k] * g[..., 2:3])
    (d_dirs,) = pull_dirs(t)
    return d_sh2c.astype(sh2c.dtype), d_dirs.astype(dirs.dtype)


eval_sh_flat_cmajor.defvjp(_eval_sh_flat_cmajor_fwd, _eval_sh_flat_cmajor_bwd)


def flat_cmajor_from_kc(sh3: jnp.ndarray) -> jnp.ndarray:
    """[N, K, 3] coefficient-major -> flat [N, 3*K] channel-major."""
    n = sh3.shape[0]
    return jnp.swapaxes(sh3, -1, -2).reshape(n, -1)


def kc_from_flat_cmajor(sh2c: jnp.ndarray) -> jnp.ndarray:
    """Flat [N, 3*K] channel-major -> [N, K, 3] coefficient-major."""
    n = sh2c.shape[0]
    return jnp.swapaxes(sh2c.reshape(n, 3, -1), -1, -2)


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference utils/sh_utils.py:114)."""
    return (rgb - 0.5) / _C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (reference utils/sh_utils.py:117)."""
    return sh * _C0 + 0.5
