"""Packed per-gaussian screen data: one gather instead of many.

Random gathers on TPU cost ~the same per *row* regardless of row width
(32B+ access granularity), so gathering six separate per-gaussian arrays by
the 3M-slot instance stream wastes most of the bandwidth. Instead the
projected attributes are packed once into a (16, N) f32 matrix (a cheap
N-sized transpose), and the instance stream gathers columns in a single op
— which is also exactly the feature-major layout the Pallas blend kernels
DMA from HBM (ops/blend_pallas.py).

Row layout (shared contract with blend_pallas):
  0:2 mean2d | 2:5 conic | 5:8 color | 8 opacity | 9:16 zero padding
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ROW_MX, ROW_MY = 0, 1
ROW_CXX, ROW_CXY, ROW_CYY = 2, 3, 4
ROW_R, ROW_G, ROW_B = 5, 6, 7
ROW_OP = 8
PACK_ROWS = 16


def pack_projected(means2d, conics, colors, opacities) -> jnp.ndarray:
    """[N,2]/[N,3]/[N,3]/[N] -> (N, 16) f32 (differentiable).

    Row-major per-gaussian rows: the instance gather then reads contiguous
    64B rows (a column gather of a (16, N) layout would stride by N)."""
    n = means2d.shape[0]
    cols = jnp.concatenate(
        [means2d, conics, colors, opacities[:, None]], axis=1
    )  # (N, 9)
    return jnp.concatenate(
        [cols, jnp.zeros((n, PACK_ROWS - cols.shape[1]), cols.dtype)], axis=1
    )


def gather_instances(pack: jnp.ndarray, ids: jnp.ndarray,
                     slot_valid: jnp.ndarray,
                     mask_dead: bool = True) -> jnp.ndarray:
    """(N, 16) x [K] -> (16, K); dead slots get zero opacity.

    Row gather (contiguous) followed by a dense transpose into the
    feature-major layout the Pallas kernels DMA. Differentiable: the
    transpose of the gather is a segment-sum back to owner rows.

    `mask_dead=False` skips the opacity zeroing of dead slots (~1.2 ms of
    fused mask+copy at 786k slots): safe whenever the blenders' per-tile
    [start, end) ranges can never cover a dead slot — true on the dense
    binning path, where dead keys sort past every tile boundary.
    """
    inst = pack[ids].T                                  # (16, K)
    if not mask_dead:
        return inst
    mask = slot_valid.astype(inst.dtype)[None, :]
    row_sel = (jnp.arange(PACK_ROWS) == ROW_OP)[:, None]
    return jnp.where(row_sel, inst * mask, inst)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6))
def gather_instances_perm(pack_ranked, ranks, slot_valid, capacity,
                          rank_counts=None, max_seg=None, mask_dead=True):
    """(N, 16) depth-rank-ordered pack x [K] stream -> (16, K).

    Functionally matches `gather_instances(pack_ranked, ranks, slot_valid)`
    with a hand-written transpose over the LIVE stream prefix (`capacity`
    slots; the dense binning sorts live keys to a contiguous prefix and
    probes `total` against this bound).

    Two reduction strategies for the cotangent:
      * rank_counts is None: one scatter-add over the prefix (~13 ns/row
        measured: a random read-modify-write pair per row).
      * rank_counts given ([N] live slots per rank, from
        binning_dense.rank_live_counts) + max_seg (static bound on slots
        per gaussian, e.g. the tile count): the nine gradient-carrying
        planes RIDE the rank sort as payloads (measured: a 9-payload sort
        costs ~the same as a key+iota pair sort, while a rank-order row
        gather of the 28 MB stream pays the ~4.5 ns/row random-HBM floor
        — the source exceeds XLA's VMEM gather-staging cliff), then a
        segmented shift-add lands each segment's total on its first row
        and ONE [N]-row gather fetches the heads.
        CAVEAT: if true demand exceeded `capacity` (overflow probe firing),
        counts and the truncated stream disagree and this step's gradients
        are finite but wrong until the host re-buckets — the same
        transient the scatter path spends on dropped contributions.

    Args:
      pack_ranked: (N, 16) projected pack in depth-rank order.
      ranks: [K] depth rank per sorted stream position.
      slot_valid: [K] live mask (dead tail slots get zero opacity).
      capacity: static bound on the live prefix the backward reduces over.
      rank_counts: optional [N] int32 live-slot count per rank.
      max_seg: static upper bound on any single rank's slot count.
      mask_dead: see `gather_instances`.
    """
    return gather_instances(pack_ranked, ranks, slot_valid, mask_dead)


def _gather_perm_fwd(pack_ranked, ranks, slot_valid, capacity, rank_counts,
                     max_seg, mask_dead):
    out = gather_instances(pack_ranked, ranks, slot_valid, mask_dead)
    return out, (ranks, slot_valid, rank_counts, pack_ranked.shape[0])


def _gather_perm_bwd(capacity, max_seg, mask_dead, residuals, g):
    ranks, slot_valid, rank_counts, n = residuals
    cap = min(capacity, ranks.shape[0])
    if rank_counts is None:
        gt = g[:, :cap].T                              # (cap, 16)
        # grads beyond the live prefix are exact zeros (the blend backward
        # zero-fills past coverage), making the prefix slice safe
        d_by_rank = jnp.zeros((n, PACK_ROWS), g.dtype).at[ranks[:cap]].add(
            gt, mode="drop"
        )
        return (d_by_rank, None, None, None)

    # rank-grouped MULTI-PAYLOAD sort + segmented reduce (see docstring).
    # Only rows 0:9 of the pack carry gradients; the nine planes ride the
    # rank sort as payloads. Measured on v5e: payloads are ~free (a
    # 9-payload sort costs the same as a key+iota pair sort), while the
    # alternative — pair-sort positions then ROW-GATHER the 28 MB stream
    # into rank order — pays the ~4.5 ns/row random-HBM floor (~3.5 ms at
    # 786k slots; the source is too big for XLA's VMEM gather staging,
    # see profile_gather_staging.py).
    rk = jnp.where(slot_valid[:cap], ranks[:cap], n)   # dead slots last
    # unstable: within-segment order is irrelevant to a segment sum
    sorted_all = jax.lax.sort(
        (rk,) + tuple(g[i, :cap] for i in range(ROW_OP + 1)),
        num_keys=1, is_stable=False,
    )
    rk_sorted = sorted_all[0]
    x9 = jnp.stack(sorted_all[1:], axis=1)             # (cap, 9) by rank
    # segmented suffix accumulation: after log2(max_seg) masked shift-adds
    # each segment's FIRST row holds the segment total (keys are sorted,
    # so an equal key at distance s implies the whole gap is one segment).
    # One 9-wide scan keeps the segment heads in a single array so ONE
    # [N]-row gather fetches them (an 8+1 split pays a second head gather,
    # ~0.7 ms at 100k ranks).
    shift = 1
    while shift < max(2, max_seg):
        same = jnp.pad(rk_sorted[shift:] == rk_sorted[:-shift], (0, shift))
        x9 = x9 + jnp.where(same[:, None],
                            jnp.pad(x9[shift:], ((0, shift), (0, 0))), 0.0)
        shift *= 2
    starts = jnp.minimum(
        jnp.cumsum(rank_counts) - rank_counts, cap - 1)  # exclusive cumsum
    live = (rank_counts > 0)[:, None]
    d_by_rank = jnp.concatenate([
        jnp.where(live, x9[starts], 0.0),
        jnp.zeros((n, PACK_ROWS - ROW_OP - 1), g.dtype),
    ], axis=1)
    return (d_by_rank, None, None, None)


gather_instances_perm.defvjp(_gather_perm_fwd, _gather_perm_bwd)


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """x[perm] with a gather-based transpose (grads gathered by inv_perm).

    XLA's native transpose of a gather is a scatter-add; on this hardware
    scatters serialize, so for a *permutation* we hand it the inverse
    gather instead.
    """
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return (g[inv_perm], None, None)


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def unpack_rows(inst: jnp.ndarray):
    """(16, K) -> (means2d [K,2], conics [K,3], colors [K,3], opac [K])."""
    return (
        inst[ROW_MX:ROW_MY + 1].T,
        inst[ROW_CXX:ROW_CYY + 1].T,
        inst[ROW_R:ROW_B + 1].T,
        inst[ROW_OP],
    )
