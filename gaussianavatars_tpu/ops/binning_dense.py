"""Dense multi-level tile binning: the fast path.

TPU-native replacement for the CUDA duplicated-key radix-sort binning
(reference submodule `diff-gaussian-rasterization`, SURVEY.md N1), second
generation. The first generation (ops/binning.py) expanded variable-length
tile rects into a slot stream via scatter + cummax + big gathers; on real
hardware each 1M-scale gather/scatter/divmod op costs milliseconds while
fused elementwise work is essentially free, so this version is built from
elementwise math plus exactly one single-array sort.

Design:

  * gaussians are depth-sorted once (N keys); their depth *rank* is the
    within-tile ordering token from then on
  * every gaussian is routed to the smallest "level" whose static
    rect_w x rect_h tile grid covers its tile rect. Level 0 holds all N
    gaussians; higher levels hold a compacted tail (top_k by rect area)
    in a static bucket. The last level's grid covers the full tile grid,
    so coverage is EXACT for any scene — no clamping, matching the
    reference's unbounded per-gaussian tile ranges
  * each level lays its gaussians out densely: slot (g, j) covers tile
    (x0[g] + j % RW, y0[g] + j // RW) where j % RW and j // RW are
    compile-time constants — no gather, no integer division, no owner
    reconstruction; the precise r2_max cull is elementwise in the grid
  * all levels' slots concatenate and sort by the packed key
    key = tile_id << RANK_BITS | depth_rank. A gaussian meets a tile at
    most once, so keys are unique — a payload-free single-array sort
    (cheapest sort shape on TPU) fully orders the stream front-to-back
  * per-tile [start, end) ranges via searchsorted on the tile field

The live stream is the contiguous prefix (sentinel keys sort to the end);
`total` reports its length against the static `capacity` the backward
reduction uses (ops/instance_pack.gather_instances_perm). Per-level bucket
overflow (more tail gaussians than the static bucket) is reported in
`level_overflow` so the host can re-bucket — the same grow-and-rejit
protocol as the capacity probe of the sort-expansion path.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from gaussianavatars_tpu.ops.binning import compute_tile_rects, tile_grid

RANK_BITS = 17  # depth-rank field width; N must fit (<= 131072 gaussians)


def default_levels(ntx: int, nty: int) -> tuple[tuple[int, int, int | None], ...]:
    """Level plan covering any rect exactly: (rect_w, rect_h, bucket).

    Level 0 (bucket None) holds every gaussian; the last level's grid
    covers the full tile grid. Buckets are compile-time; the host grows
    them on `level_overflow` like the capacity bucket. Rects clamp to the
    grid, and levels made redundant by a small grid are dropped.
    """
    # sized from measured avatar-like rect distributions under the
    # anisotropic ext rects (~74% of live gaussians fit 3x3 tiles, ~95%
    # fit 4x4, p99 area ~20 at tile_size 32): slot count — the unit every
    # sort/build cost scales with — keeps ~1.3-2x bucket headroom over the
    # measured routing counts (overflow still probed + host-grown)
    plan = [
        (min(3, ntx), min(3, nty), None),
        (min(4, ntx), min(4, nty), 24576),
        (min(6, ntx), min(6, nty), 6144),
        (min(10, ntx), min(10, nty), 768),
        (ntx, nty, 96),
    ]
    out = [plan[0]]
    for w, h, bucket in plan[1:]:
        if (w, h) == (out[-1][0], out[-1][1]):
            continue
        out.append((w, h, bucket))
    if len(out) == 1:
        # level 0 already spans the grid; exactness needs no tail levels
        return ((ntx, nty, None),)
    return tuple(out)


def scaled_levels(ntx: int, nty: int, scale: int = 1, per_level=()):
    """default_levels with tail buckets scaled (the host's grow-and-rejit
    response to a level_overflow probe).

    `scale` multiplies every tail bucket (legacy global knob);
    `per_level[i]` additionally multiplies ONLY tail level i+1's bucket
    (index into the overflow vector, i.e. bucket levels only) — growing
    one overflowing level must not inflate the others' slot counts,
    which every sort/key-build cost scales with.
    """
    out = []
    ti = 0
    for w, h, b in default_levels(ntx, nty):
        if b is None:
            out.append((w, h, None))
            continue
        mult = scale * (per_level[ti] if ti < len(per_level) else 1)
        out.append((w, h, min(b * mult, 1 << RANK_BITS)))
        ti += 1
    return tuple(out)


class DenseBinning(NamedTuple):
    ranks: jnp.ndarray           # [K] int32 depth rank per sorted slot
    instance_valid: jnp.ndarray  # [K] bool (False = dead tail)
    perm: jnp.ndarray            # [N] int32 depth order: perm[rank] = orig id
    inv_perm: jnp.ndarray        # [N] int32 rank of each original id
    tile_starts: jnp.ndarray     # [T] int32
    tile_ends: jnp.ndarray       # [T] int32
    total: jnp.ndarray           # [] int32 live instance count
    level_overflow: jnp.ndarray  # [L] int32 per-level bucket shortfall
                                 # (routed count minus bucket; > 0 drops)
    level_sizes: tuple           # static (gaussians_per_level, kmax) pairs
    num_tiles_x: int
    num_tiles_y: int
    rank_live_counts: jnp.ndarray = None  # [N] live slots per depth rank
                                 # (drives the gather-based gradient
                                 # reduction, instance_pack.py)

    @property
    def gaussian_ids(self):
        """Original gaussian id per sorted slot (compat with ops/binning)."""
        return self.perm[self.ranks]


def _box_qmin(ax, bx, ay, by, cxx, cxy, cyy, rx, ry):
    """Exact min of q(d) = cxx dx^2 + 2 cxy dx dy + cyy dy^2 over the box
    [ax,bx] x [ay,by] (coordinates relative to the gaussian center).

    q is convex (PD conic): if the origin is inside the box the min is 0;
    otherwise it lies on one of the four edges, where the 1D restriction is
    a clamped quadratic with closed-form argmin (rx = -cxy/cyy is the
    unconstrained y* per unit x, ry = -cxy/cxx symmetric). All elementwise,
    fuses into the key-build kernel.
    """
    def edge_x(e):
        ystar = jnp.clip(rx * e, ay, by)
        return (cxx * e + 2.0 * cxy * ystar) * e + cyy * ystar * ystar

    def edge_y(e):
        xstar = jnp.clip(ry * e, ax, bx)
        return (cyy * e + 2.0 * cxy * xstar) * e + cxx * xstar * xstar

    qmin = jnp.minimum(
        jnp.minimum(edge_x(ax), edge_x(bx)),
        jnp.minimum(edge_y(ay), edge_y(by)),
    )
    inside = (ax <= 0.0) & (bx >= 0.0) & (ay <= 0.0) & (by >= 0.0)
    return jnp.where(inside, 0.0, qmin)


def _level_keys(
    rank_ids, x0, y0, rw, rh, live, cull, rect_w, rect_h,
    num_tiles, ntx, nty, tile_size, tile_row_start,
):
    """Dense (G, RW*RH) slot grid for one level -> flat packed keys.

    All inputs are per-routed-gaussian arrays of length G; slot tile
    offsets are compile-time constants so everything here fuses into one
    elementwise kernel. `cull` is None, a circle test (mx, my, r2), or an
    exact ellipse test (mx, my, cxx, cxy, cyy, tau): a tile whose pixel box
    has min_d q(d) > tau holds no pixel with alpha >= 1/255, so dropping it
    is image-exact — and for anisotropic splats it prunes the rect's
    off-axis corners the circle bound cannot.
    """
    kmax = rect_w * rect_h
    # slot-major (kmax, G) layout: the sort input order is irrelevant, and
    # feature-major rows keep every intermediate a full-lane (1, G) vector
    # (a (G, kmax<=9) row-major build wastes 119/128 of each vreg tile)
    jx = jnp.arange(kmax, dtype=jnp.int32)[:, None] % rect_w
    jy = jnp.arange(kmax, dtype=jnp.int32)[:, None] // rect_w
    tx = x0[None, :] + jx
    ty = y0[None, :] + jy
    slot_live = (
        live[None, :]
        & (jx < rw[None, :])
        & (jy < rh[None, :])
        & (tx < ntx)
        & (ty < nty)
    )
    if cull is not None:
        ts = jnp.float32(tile_size)
        bx_lo = tx.astype(jnp.float32) * ts
        by_lo = (ty + tile_row_start).astype(jnp.float32) * ts
        if len(cull) == 3:
            mx, my, r2 = cull
            mxb = mx[None, :]
            myb = my[None, :]
            dx = jnp.maximum(
                jnp.maximum(bx_lo - mxb, mxb - (bx_lo + ts - 1)), 0.0)
            dy = jnp.maximum(
                jnp.maximum(by_lo - myb, myb - (by_lo + ts - 1)), 0.0)
            slot_live = slot_live & (dx * dx + dy * dy <= r2[None, :])
        else:
            mx, my, cxx, cxy, cyy, tau = cull
            # per-gaussian 1D argmin slopes (G-sized, hoisted out of the
            # (kmax, G) grid); conic diagonals are strictly positive for
            # live gaussians (0.3 px dilation), the guard covers dead rows
            rx = -cxy / jnp.maximum(cyy, 1e-12)
            ry = -cxy / jnp.maximum(cxx, 1e-12)
            qmin = _box_qmin(
                bx_lo - mx[None, :], bx_lo + ts - 1 - mx[None, :],
                by_lo - my[None, :], by_lo + ts - 1 - my[None, :],
                cxx[None, :], cxy[None, :], cyy[None, :],
                rx[None, :], ry[None, :],
            )
            slot_live = slot_live & (qmin <= tau[None, :])
    tile_id = jnp.where(slot_live, ty * ntx + tx, num_tiles)
    keys = (tile_id << RANK_BITS) | rank_ids[None, :]
    row_counts = jnp.sum(slot_live.astype(jnp.int32), axis=0)   # (G,)
    return keys.reshape(-1), row_counts


def bin_gaussians_dense(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    levels: Sequence[tuple[int, int, int | None]] | None = None,
    tile_row_start=0,
    tile_rows: int | None = None,
    means2d_cull: jnp.ndarray | None = None,
    r2_max: jnp.ndarray | None = None,
    ext_x: jnp.ndarray | None = None,
    ext_y: jnp.ndarray | None = None,
    conics: jnp.ndarray | None = None,
    tau: jnp.ndarray | None = None,
) -> DenseBinning:
    """Build the tile-major depth-sorted instance stream (dense layout).

    Args mirror ops/binning.bin_gaussians; `levels` is the static routing
    plan (see `default_levels`). Coverage is exact when the last level's
    rect spans the tile grid and no bucket overflows (probed).

    Anisotropic tightening (both image-exact, see ops/projection.py):
      * `ext_x`/`ext_y`: per-axis half extents replace the square `radii`
        rect (elongated splats claim far fewer tiles)
      * `conics` + `tau` (with `means2d_cull`): exact ellipse-box tile test
        q_min(tile) <= tau replaces the isotropic circle bound `r2_max`
    """
    n = means2d.shape[0]
    assert n <= (1 << RANK_BITS), (
        f"{n} gaussians exceed the {1 << RANK_BITS} rank field; shard the "
        "primitive axis or widen RANK_BITS"
    )
    ntx, nty_full = tile_grid(width, height, tile_size)
    nty = nty_full if tile_rows is None else tile_rows
    num_tiles = ntx * nty
    assert (num_tiles + 1) << RANK_BITS < 2 ** 31, (
        "tile id field overflows int32; use a larger tile_size or shard "
        "the tile rows"
    )
    if levels is None:
        levels = default_levels(ntx, nty)
    assert levels[0][2] is None, "level 0 must be uncompacted (bucket=None)"
    assert levels[-1][0] >= ntx and levels[-1][1] >= nty, (
        "last level must cover the full tile grid for exact coverage"
    )

    # ---- depth order over gaussians (invalid sort to the end) --------------
    depth_key = jnp.where(valid, depths, jnp.inf).astype(jnp.float32)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((depth_key, iota), num_keys=1)
    _, inv_perm = jax.lax.sort((perm, iota), num_keys=1)

    # Everything below runs in the ORIGINAL gaussian order: the slot keys
    # only need the depth RANK in their low bits, and inv_perm IS the rank
    # of each original id — so the rects/cull columns fuse straight out of
    # the projection with no packed-column stack, no [perm] row gather and
    # no bitcast glue (the r3 rank-ordered build paid ~0.5 ms of exactly
    # that at 100k gaussians).
    if ext_x is not None and ext_y is not None:
        from gaussianavatars_tpu.ops.binning import compute_tile_rects_ext
        x0, y0, x1, y1 = compute_tile_rects_ext(
            means2d, ext_x, ext_y, radii, width, height, tile_size)
    else:
        x0, y0, x1, y1 = compute_tile_rects(means2d, radii, width,
                                            height, tile_size)
    ellipse = (means2d_cull is not None and conics is not None
               and tau is not None)
    with_cull = ellipse or (means2d_cull is not None and r2_max is not None)
    if ellipse:
        cull_o = (means2d_cull[:, 0], means2d_cull[:, 1],
                  conics[:, 0], conics[:, 1], conics[:, 2], tau)
    elif with_cull:
        cull_o = (means2d_cull[:, 0], means2d_cull[:, 1], r2_max)
    else:
        cull_o = None
    ncull = len(cull_o) if cull_o is not None else 0

    y0 = jnp.clip(y0 - tile_row_start, 0, nty)
    y1 = jnp.clip(y1 - tile_row_start, 0, nty)
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    live = valid & (rw > 0) & (rh > 0)

    ranks = inv_perm                      # depth rank per ORIGINAL id

    # ---- route each gaussian to the smallest level that fits its rect ------
    # levels must be nested so `need` (number of levels that don't fit) is
    # the smallest fitting level; ONE rank-packed sort then yields every
    # bucket level's members as a contiguous slice (cheaper than per-level
    # top_k compaction)
    num_levels = len(levels)
    for (w0, h0), (w1, h1) in zip(
        [(w, h) for w, h, _ in levels], [(w, h) for w, h, _ in levels][1:]
    ):
        assert w1 >= w0 and h1 >= h0, "levels must be nested (non-decreasing)"
    need = jnp.zeros((n,), jnp.int32)
    for rect_w, rect_h, _ in levels[:-1]:
        need = need + ((rw > rect_w) | (rh > rect_h)).astype(jnp.int32)
    need = jnp.where(live, need, num_levels)
    # low bits carry the ORIGINAL id (unique, so unstable sorts skip XLA's
    # implicit stability payload); bucket members then index the
    # original-order columns directly
    route_key = (need << RANK_BITS) | iota
    sorted_route = jax.lax.sort(route_key, is_stable=False)
    level_offs = jnp.searchsorted(
        sorted_route,
        (jnp.arange(num_levels + 1, dtype=jnp.int32) << RANK_BITS),
        side="left",
    ).astype(jnp.int32)
    key_parts = []
    overflow = []
    level_sizes = []
    total = jnp.int32(0)
    id_counts = jnp.zeros((n,), jnp.int32)   # live slots per ORIGINAL id
    bits = jax.lax.bitcast_convert_type
    unbits = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    for li, (rect_w, rect_h, bucket) in enumerate(levels):
        if bucket is None:
            lvl_live = live & (need == li)
            args = [ranks, x0, y0, rw, rh, lvl_live, cull_o]
            g = n
        else:
            bucket = min(bucket, n)
            count = level_offs[li + 1] - level_offs[li]
            overflow.append(jnp.maximum(count - bucket, 0))
            # dynamic_slice clamps the start near the array end, so derive
            # membership from the sliced keys' need field, not positions
            sel_keys = jax.lax.dynamic_slice(
                sorted_route, (level_offs[li],), (bucket,)
            )
            sel = sel_keys & ((1 << RANK_BITS) - 1)     # original ids
            lvl_live = (sel_keys >> RANK_BITS) == li
            g = bucket
            # ONE row gather for all per-gaussian columns (random access
            # costs per row; eight separate [sel] gathers would cost 8x);
            # the rank rides along so no second gather of inv_perm
            cols = [ranks, x0, y0, rw, rh]
            if cull_o is not None:
                cols += [bits(c.astype(jnp.float32), jnp.int32)
                         for c in cull_o]
            sub = jnp.stack(cols, axis=1)[sel]          # (bucket, 5+ncull)
            lvl_cull = (tuple(unbits(sub[:, 5 + i]) for i in range(ncull))
                        if cull_o is not None else None)
            args = [sub[:, 0], sub[:, 1], sub[:, 2], sub[:, 3], sub[:, 4],
                    lvl_live, lvl_cull]
        keys, row_counts = _level_keys(
            *args, rect_w, rect_h, num_tiles, ntx, nty, tile_size,
            tile_row_start,
        )
        key_parts.append(keys)
        level_sizes.append((g, rect_w * rect_h))
        total = total + jnp.sum(row_counts)
        if bucket is None:
            # level 0 routes by identity: counts land on original ids
            id_counts = id_counts + row_counts
        else:
            # tiny scatter (bucket-sized) onto the routed original ids
            id_counts = id_counts.at[sel].add(
                jnp.where(lvl_live, row_counts, 0), mode="drop")
    # the reduction consumes counts per RANK: one (N,) gather
    rank_counts = id_counts[perm]

    all_keys = jnp.concatenate(key_parts)

    # ---- ONE payload-free sort (keys unique: tile << RANK_BITS | rank;
    # unstable skips XLA's implicit stability payload) ----------------------
    sorted_key = jax.lax.sort(all_keys, is_stable=False)
    sorted_rank = sorted_key & ((1 << RANK_BITS) - 1)
    sorted_valid = sorted_key < (num_tiles << RANK_BITS)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(
        sorted_key, tiles << RANK_BITS, side="left"
    ).astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_key, (tiles + 1) << RANK_BITS, side="left"
    ).astype(jnp.int32)

    return DenseBinning(
        ranks=sorted_rank,
        instance_valid=sorted_valid,
        perm=perm,
        inv_perm=inv_perm,
        tile_starts=tile_starts,
        tile_ends=tile_ends,
        total=total,
        level_overflow=(jnp.stack(overflow) if overflow
                        else jnp.zeros((0,), jnp.int32)),
        level_sizes=tuple(level_sizes),
        num_tiles_x=ntx,
        num_tiles_y=nty,
        rank_live_counts=rank_counts,
    )
