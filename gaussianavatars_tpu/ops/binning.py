"""Tile binning: static-shape duplicate-key sort of gaussian instances.

TPU-native replacement for the CUDA rasterizer's duplicated (tile|depth)
radix sort + per-tile ranges (the binning stage of reference submodule
`diff-gaussian-rasterization`; see SURVEY.md N1). The CUDA design relies on
dynamic allocation and atomics; here everything is static-shape:

  1. per-gaussian tile rect from center/radius (conservative AABB test,
     same rect rule as CUDA getRect)
  2. instance count = rect area; exclusive cumsum gives each gaussian's
     contiguous instance range
  3. a *gather* expansion: instance slot k finds its owner gaussian with a
     searchsorted over the cumsum (no scatter, no atomics), then decodes
     its covered tile from the slot's rank within the rect
  4. one lexicographic `lax.sort` on (tile_id, depth) yields the
     tile-major, front-to-back instance stream
  5. per-tile [start, end) ranges via searchsorted over the sorted tile ids

The instance capacity is a static compile-time bucket; `total` reports true
demand so the host can re-bucket (see models/gaussians densification notes).
Everything here is non-differentiable bookkeeping (wrapped in stop_gradient
by the caller); gradients flow through the *gather* of per-instance data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    gaussian_ids: jnp.ndarray   # [K] int32 owner gaussian per sorted instance
    instance_valid: jnp.ndarray  # [K] bool
    tile_starts: jnp.ndarray    # [T] int32 start offset into the stream
    tile_ends: jnp.ndarray      # [T] int32 end offset
    total: jnp.ndarray          # [] int32 true number of instances (may exceed K)
    num_tiles_x: int
    num_tiles_y: int


def tile_grid(width: int, height: int, tile_size: int) -> tuple[int, int]:
    return (-(-width // tile_size), -(-height // tile_size))


def compute_tile_rects(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
):
    """Conservative tile AABB per gaussian (CUDA getRect rule).

    Returns (x0, y0, x1, y1) int32 arrays; empty rects have zero area.
    """
    ntx, nty = tile_grid(width, height, tile_size)
    r = radii.astype(means2d.dtype)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_size), 0, ntx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_size), 0, nty).astype(jnp.int32)
    # rect_max rule: floor((p + r + TILE - 1) / TILE), clipped to the grid
    # (the C truncation equals floor here because the operand is >= 0 after
    # the radius guard).
    x1 = jnp.clip(
        jnp.floor((means2d[:, 0] + r + tile_size - 1) / tile_size), 0, ntx
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((means2d[:, 1] + r + tile_size - 1) / tile_size), 0, nty
    ).astype(jnp.int32)
    return x0, y0, x1, y1


def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    capacity: int,
    tile_row_start: int = 0,
    tile_rows: int | None = None,
) -> TileBinning:
    """Build the tile-major depth-sorted instance stream.

    Args:
      means2d: [N, 2] pixel-space centers.
      depths: [N] view z (sort key within a tile, ascending = front first).
      radii: [N] int pixel radii (0 = culled).
      valid: [N] bool.
      width/height/tile_size/capacity: static ints.
      tile_row_start/tile_rows: optional static window of tile rows to bin
        (the tile-sharding hook: each device bins only the rows it blends;
        tile ids are local to the window).
    """
    n = means2d.shape[0]
    ntx, nty_full = tile_grid(width, height, tile_size)
    # tile_row_start may be traced (device-dependent under shard_map), so
    # the row count must come from the static tile_rows when windowed
    nty = nty_full if tile_rows is None else tile_rows
    num_tiles = ntx * nty

    x0, y0, x1, y1 = compute_tile_rects(
        means2d, radii, width, height, tile_size
    )
    # restrict to the local tile-row window; y becomes window-local
    y0 = jnp.clip(y0 - tile_row_start, 0, nty)
    y1 = jnp.clip(y1 - tile_row_start, 0, nty)
    rw = jnp.maximum(x1 - x0, 0)
    rh = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(valid, rw * rh, 0).astype(jnp.int32)

    offsets = jnp.cumsum(counts) - counts          # exclusive
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # --- gather-style expansion to `capacity` instance slots -----------------
    slots = jnp.arange(capacity, dtype=jnp.int32)
    # ends[i] = offsets[i] + counts[i] is monotone; owner = first i with
    # ends[i] > slot  ==  searchsorted(ends, slot, 'right')
    ends = offsets + counts
    owner = jnp.searchsorted(ends, slots, side="right").astype(jnp.int32)
    owner = jnp.minimum(owner, n - 1)
    local = slots - offsets[owner]
    rw_o = jnp.maximum(rw[owner], 1)
    tx = x0[owner] + local % rw_o
    ty = y0[owner] + local // rw_o
    tile_id = ty * ntx + tx

    inst_valid = slots < jnp.minimum(total, capacity)
    tile_id = jnp.where(inst_valid, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(inst_valid, depths[owner], jnp.inf).astype(jnp.float32)

    # --- lexicographic (tile, depth) sort ------------------------------------
    sorted_tile, _, sorted_owner = jax.lax.sort(
        (tile_id, depth_key, owner), num_keys=2
    )
    sorted_valid = sorted_tile < num_tiles

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tiles, side="left").astype(jnp.int32)
    tile_ends = jnp.searchsorted(sorted_tile, tiles, side="right").astype(jnp.int32)

    return TileBinning(
        gaussian_ids=sorted_owner,
        instance_valid=sorted_valid,
        tile_starts=tile_starts,
        tile_ends=tile_ends,
        total=total,
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )


class AlignedBinning(NamedTuple):
    """Chunk-aligned relayout of the instance stream.

    Every tile's instance range is padded to a multiple of `chunk`, so blend
    kernels can process whole chunks without ever straddling a tile boundary
    (this is what keeps per-tile gradient writes disjoint in the Pallas
    backward). Dummy slots carry slot_valid=False; callers zero their
    opacity so they blend as no-ops.
    """

    gaussian_ids: jnp.ndarray   # [Ka] owner gaussian per aligned slot
    slot_valid: jnp.ndarray     # [Ka] bool (False = padding slot)
    tile_starts: jnp.ndarray    # [T] int32, multiples of chunk
    tile_ends: jnp.ndarray      # [T] int32, multiples of chunk
    total: jnp.ndarray          # [] int32 true aligned demand (overflow probe)


def chunk_align(binning: TileBinning, chunk: int, capacity: int) -> AlignedBinning:
    """Relayout the sorted stream so each tile occupies whole chunks."""
    counts = binning.tile_ends - binning.tile_starts
    pad_counts = ((counts + chunk - 1) // chunk) * chunk
    astarts = jnp.cumsum(pad_counts) - pad_counts
    aends = astarts + pad_counts
    total = aends[-1] if aends.shape[0] > 0 else jnp.int32(0)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    tile = jnp.searchsorted(aends, slots, side="right").astype(jnp.int32)
    tile = jnp.minimum(tile, aends.shape[0] - 1)
    local = slots - astarts[tile]
    valid = (local < counts[tile]) & (slots < total)
    src = jnp.minimum(
        binning.tile_starts[tile] + local, binning.gaussian_ids.shape[0] - 1
    )
    gid = binning.gaussian_ids[src]
    return AlignedBinning(
        gaussian_ids=gid,
        slot_valid=valid,
        tile_starts=astarts,
        tile_ends=aends,
        total=total,
    )
