"""Pallas TPU kernels for the tile blend (forward + backward).

Implements exactly the chunk recurrence specified in ops/tile_blend.py (see
that module's docstring for the math derivation and the reference CUDA
semantics being reproduced), mapped onto TPU hardware:

  * grid = one program per 16x16 pixel tile (sequential on a TensorCore,
    auto double-buffered image blocks)
  * per-tile instance ranges arrive via scalar prefetch (SMEM); the kernel
    DMAs its slice of the instance stream from HBM in chunks, with the
    chunk start floor-aligned to the DMA granularity and out-of-range
    lanes masked - so the stream needs NO per-tile padding
  * instance reads are double-buffered: the next chunk's DMA is in flight
    while the current chunk computes
  * ROW FORM: per-instance quantities live as (1, CHUNK) lane-resident
    rows sliced straight off the (16, CHUNK) chunk as DMA'd — no
    per-chunk transposes, no 1-lane column ops. alpha/transmittance math
    is (CHUNK, P) VPU work with the tile's pixels on LANES; the power
    quadratic, color accumulation and the backward moment reductions are
    MXU dot_generals (bf16-split against a bf16-exact center-shifted
    pixel basis, see _power_split); in-chunk cum{prod,sum} are log-shift
    roll scans
  * the early-out is a real `while` loop: saturated tiles stop issuing
    DMAs (the CUDA done-flag work skipping)
  * the backward writes per-instance gradient chunks; a chunk shared with
    the previous tile is accumulated read-modify-write - safe because the
    Mosaic grid executes sequentially on the core

Layouts (shared with ops/instance_pack.py):
  inst pack  (16, K):  rows 0:2 mean2d, 2:5 conic, 5:8 color, 8 opacity
  image pack (T, 4, P): rows 0:3 color, 3 transmittance (P = tile pixels)
  grad pack  (16, K):  same rows as inst pack
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianavatars_tpu.ops.instance_pack import (
    PACK_ROWS,
    ROW_B,
    ROW_CXX,
    ROW_CXY,
    ROW_CYY,
    ROW_MX,
    ROW_MY,
    ROW_OP,
    ROW_R,
)

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pad_pack(inst, k_pad):
    """(16, K) -> (16, k_pad): pad the lane axis to a chunk multiple."""
    return jnp.pad(inst, ((0, 0), (0, k_pad - inst.shape[1])))


def _round_up(x, m):
    return (x + m - 1) // m * m


def _augment_ranges(ranges, ntx, num_tiles, tile_size, k_pad, py_offset=0):
    """[T,2] float ranges -> [T,4] int32 (start, end, tile_px, tile_py).

    Ends are clamped to the packed capacity so an overflowing stream (true
    demand > capacity bucket) can never drive a DMA out of bounds; the
    overflow itself is reported upstream via TileBinning.total.
    """
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_xy = jnp.stack(
        [(tiles % ntx) * tile_size,
         (tiles // ntx) * tile_size
         + jnp.asarray(py_offset, jnp.int32)], axis=-1
    )
    r = jnp.clip(ranges.astype(jnp.int32), 0, k_pad)
    return jnp.concatenate([r, tile_xy], axis=-1)


def _interpret():
    """Pallas interpret mode off-TPU (keeps the CPU test mesh working)."""
    return jax.default_backend() != "tpu"


_SCAN_IMPL = "mxu-sum"  # "mxu": triangular-matmul scans (MXU passes hide under
                    # the kernels' VPU-bound elementwise work; log-space for
                    # the transmittance product) | "roll": log-shift scans
                    # (the r2/r3 formulation; kept for A/B)


def _cumsum_sublanes(x, chunk):
    """Inclusive cumsum along the sublane (instance) axis: Hillis-Steele
    log-shift scan (log2(CH) masked rolls)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < chunk:
        rolled = pltpu.roll(x, shift, 0)
        x = x + jnp.where(rows >= shift, rolled, 0.0)
        shift *= 2
    return x


def _cumprod_sublanes(x, chunk):
    """Inclusive cumprod along the sublane (instance) axis (same log-shift
    scan shape as `_cumsum_sublanes` with a multiplicative identity)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < chunk:
        rolled = pltpu.roll(x, shift, 0)
        x = x * jnp.where(rows >= shift, rolled, 1.0)
        shift *= 2
    return x


def _tri_ones(chunk):
    """Lower-triangular (incl. diagonal) ones (CH, CH): cumsum operator."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r >= c).astype(jnp.float32)


def _cumsum_mxu(x, tri):
    """Inclusive sublane cumsum as tri @ x in TWO DEFAULT MXU passes.

    tri's entries are 0/1 (bf16-exact), so a hi/lo split of x reaches
    f32-grade accuracy (see the precision playbook in docs/performance.md).
    The r2 note "rolls beat the CH-MAC triangular matmul on the MXU's f32
    rate" predates the split trick: HIGHEST needs ~6 passes, the split
    needs 2, and both hide under the surrounding VPU-bound elementwise
    work — what the roll scan cannot do (it IS VPU work).
    """
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    x_lo = x - x_hi
    dot = lambda a: jax.lax.dot_general(
        tri, a, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dot(x_hi) + dot(x_lo)


def _cumprod_alpha(alpha, tri, chunk):
    """Inclusive sublane cumprod of (1 - alpha).

    MXU form runs in log space: cumsum(log1p(-alpha)) then exp — two
    transcendentals per element replace the log2(CH)-step roll scan's VPU
    work, and the matmul passes overlap it. alpha = 0 lanes contribute
    log1p(0) = 0 (exact multiplicative identity); alpha <= 0.99 keeps
    log1p well-conditioned, and a saturated chunk underflows exp to an
    exact 0 (the early-out region).
    """
    if _SCAN_IMPL == "mxu":
        return jnp.exp(_cumsum_mxu(jnp.log1p(-alpha), tri))
    return _cumprod_sublanes(1.0 - alpha, chunk)  # "roll" and "mxu-sum"


def _shift_down_one(x, fill):
    """Exclusive-scan shift: row i takes row i-1's value; row 0 gets fill."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows >= 1, pltpu.roll(x, 1, 0), fill)


_MM_PRECISION = jax.lax.Precision.HIGHEST  # see profile_blend A/B

import os as _os

_ABLATE = frozenset(
    filter(None, _os.environ.get("GA_BLEND_ABLATE", "").split(","))
)
if _ABLATE:            # a stale/inherited env var silently corrupts images
    import sys as _sys
    print(
        f"*** GA_BLEND_ABLATE={','.join(sorted(_ABLATE))}: blend kernels are "
        "running in TIMING-ONLY ablation mode — images and gradients are "
        "WRONG. Unset GA_BLEND_ABLATE for real runs. ***",
        file=_sys.stderr, flush=True,
    )
                       # dev-only cost attribution: {'scan2', 'moments',
                       # 'dalpha', 'cutoff'} disable kernel pieces at TRACE
                       # time (results become wrong; timing-only).
                       # 'cutoff' drops the per-pixel T<eps termination
                       # emulation (mask/t_app/ap ops) to price the CUDA
                       # done-flag semantics vs a pure-math blend

_EXACT_SPLIT = True  # dev A/B: False falls back to the HIGHEST power
                     # matmul + unshifted basis (pre-split behavior)

NSLOTS = 4  # chunk-DMA pipeline depth: reads prefetch NSLOTS-1 chunks
            # ahead and gradient writes drain NSLOTS chunks behind.
            # Measured equal to depth 2 on the canonical bench (the
            # kernels are not chunk-DMA-latency-bound); kept parameterized
            # for configs with faster per-chunk compute

POWER_FUZZ = 1e-4  # the quadratic form is mathematically <= 0 (PD conic);
                   # this absorbs f32 rounding of the MXU evaluation so the
                   # acceptance test never rejects a real peak pixel


def _pix_basis(tile_size, p, center_shift=False):
    """Quadratic pixel basis U (P, 8) = [1, px, py, px^2, px*py, py^2, 0, 0]
    in LOCAL tile coordinates (bounded magnitudes keep the MXU evaluation
    of the quadratic form inside f32 cancellation limits).

    With `center_shift`, coordinates are shifted by tile_size//2 so every
    entry is an integer in [-256, 256] for tile_size <= 32 — EXACTLY
    representable in bf16. Against an exact bf16 operand, a hi/lo-split
    matmul of the other operand reaches f32-grade accuracy in DEFAULT
    (bf16) MXU passes; see `_power_split` and the moments matmul.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (idx % tile_size).astype(jnp.float32)
    py = (idx // tile_size).astype(jnp.float32)
    if center_shift:
        c = jnp.float32(tile_size // 2)
        px = px - c
        py = py - c
    one = jnp.ones((p, 1), jnp.float32)
    zero = jnp.zeros((p, 1), jnp.float32)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], axis=1
    )


def _power_split(coef, basis):
    """power matmul in three DEFAULT (bf16) passes: the basis operand is
    bf16-EXACT (center-shifted integer entries <= 256), so a hi/mid/lo
    split of coef reaches residual ~|coef|*2^-24 — f32-grade on the
    acceptance-critical near-peak pixels (where |coef| is small because
    the mean lies inside the tile) — at HALF the MXU passes of HIGHEST.
    coef (8, CH) x basis (P, 8) -> (CH, P)."""
    dot = lambda a: jax.lax.dot_general(
        a, basis,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c0 = coef.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = coef - c0
    c1 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    c2 = r1 - c1
    return (dot(c0) + dot(c1)) + dot(c2)


def _power_coefs_rows(data, tx, ty):
    """Per-instance quadratic coefficients as ROWS: coef (8, CH) so that
    power[c, p] = coef[:, c] . U[p, :] with U the local-pixel basis.

    Expansion of -0.5(cxx dx^2 + cyy dy^2) - cxy dx dy with
    dx = mx' - px, dy = my' - py and mx', my' the mean in local tile
    coordinates (shifting keeps the expanded form inside f32 cancellation
    limits). `data` is the chunk exactly as DMA'd, feature-major (16, CH):
    every per-instance quantity stays a (1, CH) lane-resident row — full
    vregs, no (16, CH) -> (CH, 16) transpose and no 1-lane column ops.
    """
    mx = data[ROW_MX:ROW_MX + 1, :] - tx            # (1, CH)
    my = data[ROW_MY:ROW_MY + 1, :] - ty
    cxx = data[ROW_CXX:ROW_CXX + 1, :]
    cxy = data[ROW_CXY:ROW_CXY + 1, :]
    cyy = data[ROW_CYY:ROW_CYY + 1, :]
    a0 = -0.5 * (cxx * mx * mx + cyy * my * my) - cxy * mx * my
    bx = cxx * mx + cxy * my
    by = cyy * my + cxy * mx
    zero = jnp.zeros_like(a0)
    coef = jnp.concatenate(
        [a0, bx, by, -0.5 * cxx, -cxy, -0.5 * cyy, zero, zero], axis=0
    )                                               # (8, CH)
    return coef, mx, my, cxx, cxy, cyy


def _chunk_geometry(data, basis, tx, ty, row_ok, exact_split):
    """Shared fwd/bwd chunk math over the feature-major chunk: data
    (16, CH) exactly as DMA'd; basis (P, 8); row_ok (CH, 1). Returns
    (alpha, expw, unclamped) all (CH, P) plus the (1, CH) local-mean/conic
    ROWS for the backward's moment algebra. power is ONE small MXU matmul
    instead of per-(pixel, instance) VPU arithmetic; pixels live on LANES
    of the (CH, P) arrays so every per-pixel carry is a cheap (1, P) row.

    `exact_split` (static) selects the 3-pass bf16-split power matmul —
    valid only when `basis` is center-shifted with bf16-exact entries
    (tile_size <= 32); tx/ty must then carry the same center shift.
    """
    coef, mx, my, cxx, cxy, cyy = _power_coefs_rows(data, tx, ty)
    if exact_split:
        power = _power_split(coef, basis)           # (CH, P)
    else:
        power = jax.lax.dot_general(
            coef, basis,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_MM_PRECISION,
        )                                           # (CH, P)
    expw = jnp.exp(jnp.minimum(power, 0.0))
    # the one instance-major carry: opacity broadcast over pixels needs
    # the sublane axis — a single (1, CH) -> (CH, 1) relayout per chunk
    opc_col = data[ROW_OP:ROW_OP + 1, :].T          # (CH, 1)
    e = opc_col * expw
    alpha = jnp.minimum(ALPHA_MAX, e)
    ok = (power <= POWER_FUZZ) & (e >= ALPHA_MIN) & row_ok
    alpha = jnp.where(ok, alpha, 0.0)
    unclamped = ok & (e < ALPHA_MAX)
    return alpha, expw, unclamped, (mx, my, cxx, cxy, cyy)


def _split_dot(a, b, dims):
    """bf16x3 dot: hi/lo split of BOTH operands, three DEFAULT passes
    (error ~2^-17 relative vs 6-pass HIGHEST at half the MXU cost)."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    dot = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dot(a_hi, b_hi) + dot(a_lo, b_hi) + dot(a_hi, b_lo)


def _row_mask(offset, start, end, chunk):
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) + offset
    return (rows >= start) & (rows < end)


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(ranges_ref, inst_hbm, out_ref, scratch, sems,
                t_all, t_app, color_acc, basis_scr, tri_scr, *,
                tile_size, chunk, tpb):
    p = tile_size * tile_size
    # tile_size <= 32: center-shifted basis entries are bf16-exact, which
    # unlocks the 3-pass split power matmul (see _power_split)
    exact = tile_size <= 32 and _EXACT_SPLIT
    cshift = jnp.float32(tile_size // 2) if exact else jnp.float32(0.0)

    # the quadratic pixel basis is tile-independent (local coords); build
    # it once and reuse across the sequential grid (scratch persists)
    @pl.when(pl.program_id(0) == 0)
    def _():
        basis_scr[...] = _pix_basis(tile_size, p, center_shift=exact)
        tri_scr[...] = _tri_ones(chunk)

    basis = basis_scr[...]
    tri = tri_scr[...]

    def one_tile(lt):
        """Blend tile pl.program_id(0)*tpb + lt into out_ref[lt]."""
        t = pl.program_id(0) * tpb + lt
        start = ranges_ref[t, 0]
        end = ranges_ref[t, 1]
        astart = (start // chunk) * chunk
        tx = ranges_ref[t, 2].astype(jnp.float32) + cshift
        ty = ranges_ref[t, 3].astype(jnp.float32) + cshift

        t_all[...] = jnp.ones_like(t_all)
        t_app[...] = jnp.ones_like(t_app)
        color_acc[...] = jnp.zeros_like(color_acc)

        def chunk_dma(offset, slot):
            offset = pl.multiple_of((offset // chunk) * chunk, chunk)
            return pltpu.make_async_copy(
                inst_hbm.at[:, pl.ds(offset, chunk)], scratch.at[slot],
                sems.at[slot],
            )

        for k in range(NSLOTS - 1):
            c = astart + k * chunk

            @pl.when(c < end)
            def _(c=c):
                chunk_dma(c, (c // chunk) % NSLOTS).start()

        def cond(offset):
            return (offset < end) & (jnp.max(t_all[...]) >= T_EPS)

        def body(offset):
            slot = (offset // chunk) % NSLOTS
            nxt = offset + (NSLOTS - 1) * chunk

            # keep NSLOTS-1 chunk reads in flight
            @pl.when(nxt < end)
            def _():
                chunk_dma(nxt, (nxt // chunk) % NSLOTS).start()

            chunk_dma(offset, slot).wait()
            data = scratch[slot]                            # (16, CH)

            row_ok = _row_mask(offset, start, end, chunk)
            alpha, _, _, _ = _chunk_geometry(
                data, basis, tx, ty, row_ok, exact
            )
            cp = _cumprod_alpha(alpha, tri, chunk)          # (CH, P)
            cp_excl = _shift_down_one(cp, 1.0)
            if "cutoff" in _ABLATE:     # timing-only: pure-math blend
                weight = alpha * cp_excl * t_all[...]
            else:
                mask = (t_all[...] * cp) >= T_EPS
                weight = (jnp.where(mask, alpha * cp_excl, 0.0)
                          * t_app[...])

            colors_r = data[ROW_R:ROW_B + 1, :]             # (3, CH)
            contrib = _split_dot(colors_r, weight, (((1,), (0,))))
            color_acc[...] += contrib
            t_all[...] *= cp[chunk - 1:chunk, :]
            if "cutoff" not in _ABLATE:
                # applied product = cp at the last masked row = min over
                # masked rows (cp is nonincreasing and mask is monotone
                # within a chunk); 1 when no row passed (fill 2.0 > any cp)
                ap = jnp.min(jnp.where(mask, cp, 2.0), axis=0,
                             keepdims=True)
                t_app[...] *= jnp.where(ap <= 1.0, ap, 1.0)
            return offset + chunk

        final = jax.lax.while_loop(cond, body, astart)

        # an early-out may leave prefetched DMAs in flight; absorb them
        for k in range(NSLOTS - 1):
            c = final + k * chunk

            @pl.when(c < end)
            def _(c=c):
                chunk_dma(c, (c // chunk) % NSLOTS).wait()

        out_ref[lt, 0:3, :] = color_acc[...]
        out_ref[lt, 3:4, :] = (t_all[...] if "cutoff" in _ABLATE
                               else t_app[...])

    for lt in range(tpb):
        one_tile(lt)


def blend_image_fwd_pallas(
    inst, ranges,
    width, height, tile_size, chunk, py_offset=0, tiles_per_step=4,
):
    """Forward blend on TPU. Same contract as the jnp backend in
    ops/tile_blend.py (returns ([3,H,W] color-no-bg, [H,W] T))."""
    ntx, nty = -(-width // tile_size), -(-height // tile_size)
    num_tiles = ntx * nty
    p = tile_size * tile_size
    k = inst.shape[1]
    k_pad = _round_up(max(k, chunk), chunk)
    tpb = tiles_per_step
    t_pad = _round_up(num_tiles, tpb)

    inst = _pad_pack(inst, k_pad)
    ranges_i = _augment_ranges(ranges, ntx, num_tiles, tile_size, k_pad,
                               py_offset)
    ranges_i = jnp.pad(ranges_i, ((0, t_pad - num_tiles), (0, 0)))

    kernel = functools.partial(_fwd_kernel, tile_size=tile_size, chunk=chunk,
                               tpb=tpb)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_pad // tpb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (tpb, 4, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, PACK_ROWS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((NSLOTS,)),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((3, p), jnp.float32),
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((chunk, chunk), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (t_pad, 4, p), jnp.float32,
            vma=jax.typeof(inst).vma,  # inherit shard_map varying axes
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(ranges_i, inst)

    img = out[:num_tiles].reshape(nty, ntx, 4, tile_size, tile_size)
    img = img.transpose(2, 0, 3, 1, 4).reshape(4, nty * tile_size, ntx * tile_size)
    img = img[:, :height, :width]
    return img[0:3], img[3]


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(ranges_ref, inst_hbm, outpack_ref, gpack_ref, grad_hbm,
                scratch, gscratch, accscratch, sems, gsem, wsems,
                t_all, t_app, s_prefix, basis_scr, tri_scr, *,
                tile_size, chunk, tpb):
    p = tile_size * tile_size
    exact = tile_size <= 32 and _EXACT_SPLIT

    @pl.when(pl.program_id(0) == 0)
    def _():
        # tile-center-shifted (tile_size <= 32): every entry is an integer
        # in [-256, 256], EXACTLY representable in bf16 — so both the power
        # matmul (3-pass coef split, _power_split) and the moments matmul
        # (2-pass d_power hi/lo split) reach f32-grade accuracy in DEFAULT
        # passes. The moment algebra is form-invariant under the shift
        # (dx = (mx-c) - (px-c)).
        basis_scr[...] = _pix_basis(tile_size, p, center_shift=exact)
        tri_scr[...] = _tri_ones(chunk)

    basis = basis_scr[...]
    tri = tri_scr[...]

    for lt in range(tpb):
        _bwd_tile(lt, ranges_ref, inst_hbm, outpack_ref, gpack_ref,
                  grad_hbm, scratch, gscratch, accscratch, sems, gsem,
                  wsems, t_all, t_app, s_prefix, basis, tri,
                  tile_size=tile_size, chunk=chunk, tpb=tpb)


def _bwd_tile(lt, ranges_ref, inst_hbm, outpack_ref, gpack_ref, grad_hbm,
              scratch, gscratch, accscratch, sems, gsem, wsems,
              t_all, t_app, s_prefix, basis, tri, *,
              tile_size, chunk, tpb):
    p = tile_size * tile_size
    exact = tile_size <= 32 and _EXACT_SPLIT
    cshift = jnp.float32(tile_size // 2) if exact else jnp.float32(0.0)
    t = pl.program_id(0) * tpb + lt
    start = ranges_ref[t, 0]
    end = ranges_ref[t, 1]
    astart = (start // chunk) * chunk

    tx = ranges_ref[t, 2].astype(jnp.float32) + cshift
    ty = ranges_ref[t, 3].astype(jnp.float32) + cshift

    out_color = outpack_ref[lt, 0:3, :]                     # (3, P)
    out_t = outpack_ref[lt, 3:4, :]                         # (1, P)
    g_color = gpack_ref[lt, 0:3, :]                         # (3, P)
    g_t = gpack_ref[lt, 3:4, :]                             # (1, P)

    # gt_term folds into the suffix total: d_alpha subtracts both
    # (s_total - s_incl)/(1-a) and gt_term/(1-a), so carrying their sum
    # saves a (CH, P) multiply + subtract per chunk
    s_total = (jnp.sum(g_color * out_color, axis=0, keepdims=True)
               + g_t * out_t)                                      # (1, P)

    t_all[...] = jnp.ones_like(t_all)
    t_app[...] = jnp.ones_like(t_app)
    s_prefix[...] = jnp.zeros_like(s_prefix)

    def read_dma(offset, slot):
        offset = pl.multiple_of((offset // chunk) * chunk, chunk)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(offset, chunk)], scratch.at[slot],
            sems.at[slot],
        )

    for k in range(NSLOTS - 1):
        c = astart + k * chunk

        @pl.when(c < end)
        def _(c=c):
            read_dma(c, (c // chunk) % NSLOTS).start()

    def boundary_rd():
        # RMW read of the chunk shared with the previous tile; that tile
        # drained its writes before finishing, so this is race-free
        return pltpu.make_async_copy(
            grad_hbm.at[:, pl.ds(pl.multiple_of(astart, chunk), chunk)],
            accscratch, gsem,
        )

    @pl.when((astart < start) & (astart < end))
    def _():
        # prefetch at tile start: the first chunk's compute hides the
        # read instead of a synchronous stall at its write
        boundary_rd().start()

    def grad_write_dma(offset, slot):
        off = pl.multiple_of((offset // chunk) * chunk, chunk)
        return pltpu.make_async_copy(
            gscratch.at[slot], grad_hbm.at[:, pl.ds(off, chunk)],
            wsems.at[slot],
        )

    def write_grads(offset, accumulate):
        """Issue the gradient write for the chunk containing `offset`
        WITHOUT waiting (the wait happens NSLOTS chunks later when the
        slot is reused, and all writes drain before the program ends).
        Shared boundary chunks read-modify-write — race-free because the
        Mosaic grid runs sequentially and the previous tile drained its
        writes."""
        slot = (offset // chunk) % NSLOTS

        @pl.when(accumulate)
        def _():
            boundary_rd().wait()   # started at tile init
            gscratch[slot] += accscratch[...]

        grad_write_dma(offset, slot).start()

    def wait_prior_write(offset):
        """Before filling a gscratch slot, absorb the write issued
        NSLOTS chunks earlier on the same slot."""
        prev = offset - NSLOTS * chunk

        @pl.when(prev >= astart)
        def _():
            grad_write_dma(prev, (prev // chunk) % NSLOTS).wait()

    def cond(offset):
        return (offset < end) & (jnp.max(t_all[...]) >= T_EPS)

    def body(offset):
        slot = (offset // chunk) % NSLOTS
        nxt = offset + (NSLOTS - 1) * chunk

        @pl.when(nxt < end)
        def _():
            read_dma(nxt, (nxt // chunk) % NSLOTS).start()

        read_dma(offset, slot).wait()
        data = scratch[slot]                                 # (16, CH)

        row_ok = _row_mask(offset, start, end, chunk)
        alpha, _, unclamped, (mx, my, cxx, cxy, cyy) = _chunk_geometry(
            data, basis, tx, ty, row_ok, exact
        )
        cp = _cumprod_alpha(alpha, tri, chunk)               # (CH, P)
        if "cutoff" in _ABLATE:         # timing-only: pure-math blend
            t_before = t_all[...] * _shift_down_one(cp, 1.0)
            weight = alpha * t_before
            mask = row_ok                # (CH, 1) — broadcast-cheap stand-in
        else:
            mask = (t_all[...] * cp) >= T_EPS
            t_before = t_app[...] * _shift_down_one(cp, 1.0)  # (CH, P)
            weight = jnp.where(mask, alpha * t_before, 0.0)

        colors_r = data[ROW_R:ROW_B + 1, :]                  # (3, CH)
        cg = _split_dot(colors_r, g_color, (((0,), (0,))))    # (CH, P)
        dw = cg * weight
        if "scan2" in _ABLATE:
            s_incl = s_prefix[...] + dw
        elif _SCAN_IMPL in ("mxu", "mxu-sum"):
            s_incl = s_prefix[...] + _cumsum_mxu(dw, tri)
        else:
            s_incl = s_prefix[...] + _cumsum_sublanes(dw, chunk)

        inv_om = 1.0 / (1.0 - alpha)
        d_alpha = jnp.where(
            mask & unclamped,
            cg * t_before - (s_total - s_incl) * inv_om,
            0.0,
        )
        if "dalpha" in _ABLATE:
            d_alpha = alpha
        d_power = d_alpha * alpha

        # All five mean/conic gradient reductions are linear combinations
        # of the quadratic pixel moments S = U^T @ d_power^T — one MXU
        # matmul replaces five (CH, P) elementwise products plus five
        # reductions:
        #   sum_p d_power * dx   = mx*S0 - Sx            (dx = mx - px)
        #   sum_p d_power * dx^2 = mx^2*S0 - 2mx*Sx + Sxx  etc.
        # Row-form output (8, CH): the moment algebra and the gradient
        # pack assembly below stay lane-resident (1, CH) rows — the
        # (16, CH) write block needs NO transpose.
        if "moments" in _ABLATE:
            moms = jnp.broadcast_to(d_power[0:1, 0:1] * 0.0, (8, chunk))
        elif exact:
            # two DEFAULT (bf16) passes over a hi/lo split of d_power
            # against the tile-center-shifted basis whose entries are
            # bf16-EXACT integers: same accuracy as a 6-pass HIGHEST
            # matmul at 1/3 the MXU cost. mx/my already carry the center
            # shift (tx/ty include it), matching the basis frame.
            d_hi = d_power.astype(jnp.bfloat16).astype(jnp.float32)
            d_lo = d_power - d_hi
            dot = lambda a: jax.lax.dot_general(
                basis, a, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            moms = dot(d_hi) + dot(d_lo)                      # (8, CH)
        else:
            moms = jax.lax.dot_general(
                basis, d_power,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_MM_PRECISION,
            )                                                 # (8, CH)
        s0, sx, sy = moms[0:1, :], moms[1:2, :], moms[2:3, :]
        sxx, sxy, syy = moms[3:4, :], moms[4:5, :], moms[5:6, :]
        ex = mx * s0 - sx                                     # sum d_power*dx
        ey = my * s0 - sy
        exx = mx * mx * s0 - 2.0 * mx * sx + sxx
        exy = mx * my * s0 - mx * sy - my * sx + sxy
        eyy = my * my * s0 - 2.0 * my * sy + syy

        dcol = _split_dot(g_color, weight, (((1,), (1,))))   # (3, CH)
        # opacity gradient from the zeroth moment: on the unclamped mask
        # alpha = op * expw exactly, so sum_p d_alpha*expw = s0 / op — no
        # (CH, P) d_op product or lane reduction needed. Padded/dead rows
        # have op = 0 AND s0 = 0; the max() guard keeps 0/0 at 0.
        op_row = data[ROW_OP:ROW_OP + 1, :]                   # (1, CH)
        dop_row = s0 / jnp.maximum(op_row, 1e-12)             # (1, CH)
        wait_prior_write(offset)
        wslot = (offset // chunk) % NSLOTS
        gscratch[wslot] = jnp.concatenate(
            [-(cxx * ex + cxy * ey), -(cyy * ey + cxy * ex),
             -0.5 * exx, -exy, -0.5 * eyy,
             dcol, dop_row,
             jnp.zeros((PACK_ROWS - ROW_OP - 1, chunk), jnp.float32)],
            axis=0,
        )                                                     # (16, CH)

        write_grads(offset, offset < start)

        t_all[...] *= cp[chunk - 1:chunk, :]
        if "cutoff" not in _ABLATE:
            ap = jnp.min(jnp.where(mask, cp, 2.0), axis=0, keepdims=True)
            t_app[...] *= jnp.where(ap <= 1.0, ap, 1.0)
        s_prefix[...] = s_incl[chunk - 1:chunk, :]
        return offset + chunk

    offset = jax.lax.while_loop(cond, body, astart)

    # absorb possible in-flight prefetches after an early-out
    for k in range(NSLOTS - 1):
        c = offset + k * chunk

        @pl.when(c < end)
        def _(c=c):
            read_dma(c, (c // chunk) % NSLOTS).wait()

    # zero-fill grads for chunks skipped by the early-out (accumulating
    # into a boundary chunk the previous tile already wrote)
    def zcond(off):
        return off < end

    def zbody(off):
        wait_prior_write(off)
        gscratch[(off // chunk) % NSLOTS] = jnp.zeros(
            (PACK_ROWS, chunk), jnp.float32
        )
        write_grads(off, off < start)
        return off + chunk

    zend = jax.lax.while_loop(zcond, zbody, offset)

    # drain the outstanding gradient writes before the next tile can
    # read-modify-write the shared boundary chunk
    for back in range(1, NSLOTS + 1):
        prev = zend - back * chunk

        @pl.when((prev >= astart) & (prev < end))
        def _(prev=prev):
            grad_write_dma(prev, (prev // chunk) % NSLOTS).wait()


def blend_image_bwd_pallas(
    inst, ranges,
    out_color_img, out_t_img, g_color_img, g_t_img,
    width, height, tile_size, chunk, py_offset=0, tiles_per_step=4,
):
    """Backward blend on TPU: returns the (16, K) instance gradient pack."""
    ntx, nty = -(-width // tile_size), -(-height // tile_size)
    num_tiles = ntx * nty
    p = tile_size * tile_size
    k = inst.shape[1]
    k_pad = _round_up(max(k, chunk), chunk)

    inst = _pad_pack(inst, k_pad)

    def to_pack(color_img, t_img):
        x = jnp.concatenate([color_img, t_img[None]], axis=0)  # (4, H, W)
        x = jnp.pad(
            x, ((0, 0), (0, nty * tile_size - height), (0, ntx * tile_size - width))
        )
        x = x.reshape(4, nty, tile_size, ntx, tile_size)
        return x.transpose(1, 3, 0, 2, 4).reshape(num_tiles, 4, p)

    outpack = to_pack(out_color_img, out_t_img)
    gpack = to_pack(g_color_img, g_t_img)

    tpb = tiles_per_step
    t_pad = _round_up(num_tiles, tpb)
    ranges_i = _augment_ranges(ranges, ntx, num_tiles, tile_size, k_pad,
                               py_offset)
    ranges_i = jnp.pad(ranges_i, ((0, t_pad - num_tiles), (0, 0)))
    outpack = jnp.pad(outpack, ((0, t_pad - num_tiles), (0, 0), (0, 0)))
    gpack = jnp.pad(gpack, ((0, t_pad - num_tiles), (0, 0), (0, 0)))

    kernel = functools.partial(_bwd_kernel, tile_size=tile_size, chunk=chunk,
                               tpb=tpb)
    grad_pack = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_pad // tpb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (tpb, 4, p), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tpb, 4, p), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((NSLOTS, PACK_ROWS, chunk), jnp.float32),
                pltpu.VMEM((NSLOTS, PACK_ROWS, chunk), jnp.float32),
                pltpu.VMEM((PACK_ROWS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((NSLOTS,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((NSLOTS,)),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((chunk, chunk), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (PACK_ROWS, k_pad), jnp.float32,
            vma=jax.typeof(inst).vma,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret(),
    )(ranges_i, inst, outpack, gpack)

    # Slots past the covered stream were never written by any tile; zero
    # them before returning (coverage is contiguous from 0 to the last end).
    covered = (jnp.arange(k_pad, dtype=jnp.int32)[None, :]
               < ranges_i[num_tiles - 1, 1])
    grad_pack = jnp.where(covered, grad_pack, 0.0)
    return grad_pack[:, :k]
