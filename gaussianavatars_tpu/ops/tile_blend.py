"""Per-tile front-to-back alpha blending with a hand-derived VJP.

This module is the executable blueprint shared by the two blend backends:
the pure-jnp path below (runs anywhere; the CPU test/reference path) and the
Pallas TPU kernels in ops/blend_pallas.py, which implement the same chunk
recurrence on VMEM-resident pixel tiles.

Key reformulation (vs the CUDA per-pixel sequential loop in the reference's
`diff-gaussian-rasterization` submodule): the front-to-back recurrence over
instances is *batched over chunks* using log-transmittance cumsums, turning
the per-instance scalar loop into (CHUNK, P)-shaped VPU math plus (P, CHUNK)
x (CHUNK, 3) MXU matmuls. Two transmittance tracks are carried:

  logT_all     - includes every (1-alpha) factor: drives the early-out mask
                 (monotone, so the reference's latched 'done' flag becomes a
                 simple threshold test)
  logT_applied - includes only factors that passed the mask: the true
                 transmittance (identical to the sequential result)

Backward avoids the CUDA back-to-front walk entirely: since
sum_k (c_k . G) w_k == G . C(out), the suffix sums the gradient needs are
(G . C) minus a forward-order inclusive prefix — so fwd and bwd walk chunks
in the same direction with the same carries (better for DMA pipelining, no
division-by-(1-alpha) T reconstruction).

Gradient semantics match the jnp oracle (ops/rasterize_jnp.py): the 0.99
alpha clamp has zero subgradient when active; instances skipped by the
alpha<1/255 or power>0 tests contribute zero gradient.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
LOG_T_EPS = math.log(T_EPS)


class BlendInputs(NamedTuple):
    """Per-instance data, tile-major depth-sorted (from ops/binning)."""

    means2d: jnp.ndarray   # [K, 2]
    conics: jnp.ndarray    # [K, 3]
    colors: jnp.ndarray    # [K, 3]
    opacities: jnp.ndarray  # [K]


def _tile_pixel_coords(tile_size: int, dtype=jnp.float32):
    ys, xs = jnp.meshgrid(
        jnp.arange(tile_size, dtype=dtype),
        jnp.arange(tile_size, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # [P, 2]


def _chunk_alpha(pix, means, conics, opacities, in_range):
    """Alpha matrix for one chunk. pix [P,2]; chunk arrays [C,...] -> [C,P]."""
    dx = means[:, 0][:, None] - pix[None, :, 0]
    dy = means[:, 1][:, None] - pix[None, :, 1]
    power = (
        -0.5 * (conics[:, 0][:, None] * dx * dx + conics[:, 2][:, None] * dy * dy)
        - conics[:, 1][:, None] * dx * dy
    )
    e = opacities[:, None] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, e)
    ok = (power <= 0.0) & (e >= ALPHA_MIN) & in_range[:, None]
    return jnp.where(ok, alpha, 0.0), power, e, ok


def _pad_instances(arr, chunk):
    """Pad axis 0 by one chunk so dynamic_slice never clamps into live data."""
    pad = [(0, chunk)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def _blend_tile_fwd(
    tile_idx, start, end, inst: BlendInputs, tile_size: int, chunk: int,
    ntx: int, py_offset: int = 0,
):
    """Blend one tile. Returns (color [P,3], t_final [P])."""
    p = tile_size * tile_size
    dtype = inst.means2d.dtype
    tx = (tile_idx % ntx).astype(dtype) * tile_size
    ty = (tile_idx // ntx).astype(dtype) * tile_size + py_offset
    pix = _tile_pixel_coords(tile_size, dtype) + jnp.stack([tx, ty])[None, :]

    means_p = _pad_instances(inst.means2d, chunk)
    conics_p = _pad_instances(inst.conics, chunk)
    colors_p = _pad_instances(inst.colors, chunk)
    opac_p = _pad_instances(inst.opacities, chunk)

    def cond(state):
        offset, color, log_t_all, log_t_app = state
        return (offset < end) & (jnp.max(log_t_all) >= LOG_T_EPS)

    def body(state):
        offset, color, log_t_all, log_t_app = state
        cm = jax.lax.dynamic_slice(means_p, (offset, 0), (chunk, 2))
        cc = jax.lax.dynamic_slice(conics_p, (offset, 0), (chunk, 3))
        ccol = jax.lax.dynamic_slice(colors_p, (offset, 0), (chunk, 3))
        co = jax.lax.dynamic_slice(opac_p, (offset,), (chunk,))
        in_range = offset + jnp.arange(chunk, dtype=jnp.int32) < end

        alpha, _, _, _ = _chunk_alpha(pix, cm, cc, co, in_range)  # [C, P]
        lo = jnp.log1p(-alpha)
        cum_incl = jnp.cumsum(lo, axis=0)
        incl_all = log_t_all[None, :] + cum_incl
        mask = incl_all >= LOG_T_EPS
        excl_app = log_t_app[None, :] + (cum_incl - lo)
        weight = jnp.where(mask, alpha * jnp.exp(excl_app), 0.0)  # [C, P]

        color = color + jnp.matmul(
            weight.T, ccol, precision=jax.lax.Precision.HIGHEST)  # [P, 3]
        log_t_all = log_t_all + cum_incl[-1]
        log_t_app = log_t_app + jnp.sum(lo * mask, axis=0)
        return offset + chunk, color, log_t_all, log_t_app

    # seed zeros from the input so carries inherit shard_map's varying-axes
    # type (pvary) when blending runs inside a manual mesh region
    zvar = inst.means2d.reshape(-1)[0] * 0.0
    init = (
        start,
        jnp.zeros((p, 3), dtype) + zvar,
        jnp.zeros((p,), dtype) + zvar,
        jnp.zeros((p,), dtype) + zvar,
    )
    _, color, _, log_t_app = jax.lax.while_loop(cond, body, init)
    return color, jnp.exp(log_t_app)


# ----------------------------------------------------------------------------
# Backward
# ----------------------------------------------------------------------------

def _blend_tile_bwd(
    tile_idx, start, end, inst: BlendInputs, out_color, out_t, g_color, g_t,
    tile_size: int, chunk: int, ntx: int, capacity: int, py_offset: int = 0,
):
    """VJP for one tile.

    Args:
      out_color/out_t: primal outputs for this tile ([P,3], [P]).
      g_color/g_t: cotangents ([P,3], [P]).
    Returns per-instance grads scattered into [K]-shaped zero arrays is the
    caller's job; here we return (offsets_written, grads for the tile's
    instance range) via a dynamic-update into provided accumulators.
    """
    p = tile_size * tile_size
    dtype = inst.means2d.dtype
    tx = (tile_idx % ntx).astype(dtype) * tile_size
    ty = (tile_idx // ntx).astype(dtype) * tile_size + py_offset
    pix = _tile_pixel_coords(tile_size, dtype) + jnp.stack([tx, ty])[None, :]

    means_p = _pad_instances(inst.means2d, chunk)
    conics_p = _pad_instances(inst.conics, chunk)
    colors_p = _pad_instances(inst.colors, chunk)
    opac_p = _pad_instances(inst.opacities, chunk)

    # Total weighted-color-gradient sum per pixel: S_total = G . C_out.
    s_total = jnp.sum(g_color * out_color, axis=-1)        # [P]
    gt_term = g_t * out_t                                   # [P]

    d_means = jnp.zeros((capacity + chunk, 2), dtype)
    d_conics = jnp.zeros((capacity + chunk, 3), dtype)
    d_colors = jnp.zeros((capacity + chunk, 3), dtype)
    d_opac = jnp.zeros((capacity + chunk,), dtype)

    def cond(state):
        offset = state[0]
        log_t_all = state[1]
        return (offset < end) & (jnp.max(log_t_all) >= LOG_T_EPS)

    def body(state):
        (offset, log_t_all, log_t_app, s_prefix,
         d_means, d_conics, d_colors, d_opac) = state
        cm = jax.lax.dynamic_slice(means_p, (offset, 0), (chunk, 2))
        cc = jax.lax.dynamic_slice(conics_p, (offset, 0), (chunk, 3))
        ccol = jax.lax.dynamic_slice(colors_p, (offset, 0), (chunk, 3))
        co = jax.lax.dynamic_slice(opac_p, (offset,), (chunk,))
        in_range = offset + jnp.arange(chunk, dtype=jnp.int32) < end

        alpha, power, e, ok = _chunk_alpha(pix, cm, cc, co, in_range)
        lo = jnp.log1p(-alpha)
        cum_incl = jnp.cumsum(lo, axis=0)
        mask = (log_t_all[None, :] + cum_incl) >= LOG_T_EPS
        t_before = jnp.exp(log_t_app[None, :] + (cum_incl - lo))   # [C, P]
        weight = jnp.where(mask, alpha * t_before, 0.0)

        hi = jax.lax.Precision.HIGHEST
        cg = jnp.matmul(ccol, g_color.T, precision=hi)              # [C, P]
        dw = cg * weight                                            # per-inst, per-pix
        s_incl = s_prefix[None, :] + jnp.cumsum(dw, axis=0)         # [C, P]

        inv_om = 1.0 / (1.0 - alpha)
        d_alpha = jnp.where(
            mask,
            cg * t_before - (s_total[None, :] - s_incl) * inv_om
            - gt_term[None, :] * inv_om,
            0.0,
        )
        # clamp subgradient: zero where the 0.99 cap was active
        unclamped = ok & (e < ALPHA_MAX)
        d_alpha = jnp.where(unclamped, d_alpha, 0.0)

        d_power = d_alpha * alpha                                    # [C, P]
        dx = cm[:, 0][:, None] - pix[None, :, 0]
        dy = cm[:, 1][:, None] - pix[None, :, 1]
        gm_x = d_power * (-(cc[:, 0][:, None] * dx + cc[:, 1][:, None] * dy))
        gm_y = d_power * (-(cc[:, 2][:, None] * dy + cc[:, 1][:, None] * dx))
        gc_xx = d_power * (-0.5 * dx * dx)
        gc_xy = d_power * (-dx * dy)
        gc_yy = d_power * (-0.5 * dy * dy)

        ones = jnp.ones((p,), dtype)
        ch_d_means = jnp.stack(
            [jnp.matmul(gm_x, ones, precision=hi),
             jnp.matmul(gm_y, ones, precision=hi)], axis=-1)         # [C, 2]
        ch_d_conics = jnp.stack(
            [jnp.matmul(gc_xx, ones, precision=hi),
             jnp.matmul(gc_xy, ones, precision=hi),
             jnp.matmul(gc_yy, ones, precision=hi)], axis=-1,
        )
        ch_d_colors = jnp.matmul(weight, g_color, precision=hi)       # [C, 3]
        ch_d_opac = jnp.sum(
            jnp.where(unclamped & mask, d_alpha, 0.0)
            * jnp.exp(jnp.minimum(power, 0.0)),
            axis=1,
        )

        d_means = jax.lax.dynamic_update_slice(d_means, ch_d_means, (offset, 0))
        d_conics = jax.lax.dynamic_update_slice(d_conics, ch_d_conics, (offset, 0))
        d_colors = jax.lax.dynamic_update_slice(d_colors, ch_d_colors, (offset, 0))
        d_opac = jax.lax.dynamic_update_slice(d_opac, ch_d_opac, (offset,))

        log_t_all = log_t_all + cum_incl[-1]
        log_t_app = log_t_app + jnp.sum(lo * mask, axis=0)
        s_prefix = s_incl[-1]
        return (offset + chunk, log_t_all, log_t_app, s_prefix,
                d_means, d_conics, d_colors, d_opac)

    zvar = inst.means2d.reshape(-1)[0] * 0.0
    init = (
        start,
        jnp.zeros((p,), dtype) + zvar,
        jnp.zeros((p,), dtype) + zvar,
        jnp.zeros((p,), dtype) + zvar,
        d_means + zvar, d_conics + zvar, d_colors + zvar, d_opac + zvar,
    )
    state = jax.lax.while_loop(cond, body, init)
    _, _, _, _, d_means, d_conics, d_colors, d_opac = state
    return (
        d_means[: capacity], d_conics[: capacity],
        d_colors[: capacity], d_opac[: capacity],
    )


# ----------------------------------------------------------------------------
# Public API: full-image blend over all tiles, custom VJP
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def blend_image(
    inst, ranges, py_offset,
    width: int, height: int, tile_size: int, chunk: int, backend: str,
):
    """Blend the sorted instance stream into a full image.

    Args:
      inst: (16, K) packed tile-major depth-sorted per-instance data
        (ops/instance_pack.py layout; dead slots carry zero opacity).
      ranges: [T, 2] float32 (start, end) per tile (cast to int inside).
      py_offset: [] global pixel-row offset of this slab (traced so tile-row
        sharding can derive it from the device's axis index).
      width/height/tile_size/chunk: static ints.
      backend: 'jnp' (portable) or 'pallas' (TPU kernels).

    Returns:
      (color [3, H, W] without background, transmittance [H, W]) where H is
      the slab height passed as `height`.
    """
    out, _ = _blend_image_fwd_impl(
        inst, ranges, py_offset, width, height, tile_size, chunk, backend,
    )
    return out


def _blend_image_fwd_impl(
    inst, ranges, py_offset, width, height, tile_size, chunk, backend,
):
    if backend == "pallas":
        from gaussianavatars_tpu.ops import blend_pallas

        out = blend_pallas.blend_image_fwd_pallas(
            inst, ranges, width, height, tile_size, chunk, py_offset,
        )
        return out, out

    from gaussianavatars_tpu.ops.instance_pack import unpack_rows

    means2d, conics, colors, opacities = unpack_rows(inst)
    ntx, nty = -(-width // tile_size), -(-height // tile_size)
    bi = BlendInputs(means2d, conics, colors, opacities)
    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)

    def tile_fn(t):
        return _blend_tile_fwd(t, starts[t], ends[t], bi, tile_size, chunk,
                               ntx, py_offset)

    tiles = jnp.arange(ntx * nty, dtype=jnp.int32)
    color_t, trans_t = jax.lax.map(tile_fn, tiles)  # [T, P, 3], [T, P]

    color = _untile(color_t, ntx, nty, tile_size, width, height, 3)
    trans = _untile(trans_t[..., None], ntx, nty, tile_size, width, height, 1)[..., 0]
    out = (color.transpose(2, 0, 1), trans)
    return out, out


def _untile(x, ntx, nty, ts, width, height, c):
    """[T, P, c] -> [H, W, c] crop."""
    img = x.reshape(nty, ntx, ts, ts, c).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * ts, ntx * ts, c)
    return img[:height, :width]


def _retile(img, ntx, nty, ts):
    """[H, W, c] (zero-padded) -> [T, P, c]."""
    c = img.shape[-1]
    pad_h = nty * ts - img.shape[0]
    pad_w = ntx * ts - img.shape[1]
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    x = img.reshape(nty, ts, ntx, ts, c).transpose(0, 2, 1, 3, 4)
    return x.reshape(nty * ntx, ts * ts, c)


def _blend_image_fwd(
    inst, ranges, py_offset, width, height, tile_size, chunk, backend,
):
    out, _ = _blend_image_fwd_impl(
        inst, ranges, py_offset, width, height, tile_size, chunk, backend,
    )
    residuals = (inst, ranges, py_offset, out)
    return out, residuals


def _blend_image_bwd(width, height, tile_size, chunk, backend,
                     residuals, cots):
    inst, ranges, py_offset, out = residuals
    g_color_img, g_t_img = cots
    out_color_img, out_t_img = out

    if backend == "pallas":
        from gaussianavatars_tpu.ops import blend_pallas

        d_inst = blend_pallas.blend_image_bwd_pallas(
            inst, ranges, out_color_img, out_t_img, g_color_img, g_t_img,
            width, height, tile_size, chunk, py_offset,
        )
        return (d_inst, jnp.zeros_like(ranges), jnp.zeros_like(py_offset))

    from gaussianavatars_tpu.ops.instance_pack import PACK_ROWS, unpack_rows

    means2d, conics, colors, opacities = unpack_rows(inst)
    ntx, nty = -(-width // tile_size), -(-height // tile_size)
    capacity = means2d.shape[0]
    bi = BlendInputs(means2d, conics, colors, opacities)
    starts = ranges[:, 0].astype(jnp.int32)
    ends = ranges[:, 1].astype(jnp.int32)

    out_color_t = _retile(out_color_img.transpose(1, 2, 0), ntx, nty, tile_size)
    out_t_t = _retile(out_t_img[..., None], ntx, nty, tile_size)[..., 0]
    g_color_t = _retile(g_color_img.transpose(1, 2, 0), ntx, nty, tile_size)
    g_t_t = _retile(g_t_img[..., None], ntx, nty, tile_size)[..., 0]

    def tile_fn(carry, t):
        d_means, d_conics, d_colors, d_opac = carry
        tm, tc, tcol, to = _blend_tile_bwd(
            t, starts[t], ends[t], bi,
            out_color_t[t], out_t_t[t], g_color_t[t], g_t_t[t],
            tile_size, chunk, ntx, capacity, py_offset,
        )
        return (d_means + tm, d_conics + tc, d_colors + tcol, d_opac + to), None

    init = (
        jnp.zeros_like(means2d),
        jnp.zeros_like(conics),
        jnp.zeros_like(colors),
        jnp.zeros_like(opacities),
    )
    tiles = jnp.arange(ntx * nty, dtype=jnp.int32)
    (d_means, d_conics, d_colors, d_opac), _ = jax.lax.scan(tile_fn, init, tiles)

    d_rows = jnp.concatenate(
        [d_means.T, d_conics.T, d_colors.T, d_opac[None, :]], axis=0
    )
    d_inst = jnp.concatenate(
        [d_rows, jnp.zeros((PACK_ROWS - d_rows.shape[0], capacity),
                           d_rows.dtype)], axis=0,
    )
    return (d_inst, jnp.zeros_like(ranges), jnp.zeros_like(py_offset))


blend_image.defvjp(_blend_image_fwd, _blend_image_bwd)
