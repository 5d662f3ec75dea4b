#!/usr/bin/env python3
"""A/B harness for the backward rank-grouped reduction (dev tool).

Times isolated formulations of gather_instances_perm's cotangent reduction
on the real chip: the (cap,16) rank-grouped gather's source/dest layouts
decide most of the cost (fusion.10 = 3.56 ms in the r2 fwd+bwd trace).

CAVEAT (measured): the wall-clock numbers this prints are NOT trustworthy —
the axon tunnel serves repeated dispatches from a value-aware cache even
with the salt folded through `g` (0.135 ms wall vs 6.06 ms true device time
for variant a). Use an xplane trace of the same functions for real numbers;
findings from that trace: the gather itself runs at the ~4.5 ns/row random
HBM floor (its 50 MB source cannot be VMEM-staged like the forward stream
gather's 6.4 MB pack), the transpose relayout is nearly free (0.07 ms), and
scatter-add (c) loses as expected.
"""
import sys
import time

sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

CAP = 786_432
N = 100_000
ROWS = 16


def timeit(fn, args, iters=50):
    out = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.float32(1e-7 * (i + 1)), *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(ROWS, CAP)).astype(np.float32))
    # rank per slot: ~CAP/N slots per rank, sorted stream order is arbitrary
    ranks = jnp.asarray(rng.integers(0, N, CAP).astype(np.int32))
    counts = jnp.zeros((N,), jnp.int32).at[ranks].add(1)
    max_seg = 468

    def scan_heads(x, rk_sorted, counts, cap):
        x8, x1 = x[:, :8], x[:, 8:9]
        shift = 1
        while shift < max_seg:
            same = jnp.pad(rk_sorted[shift:] == rk_sorted[:-shift], (0, shift))
            x8 = x8 + jnp.where(same[:, None],
                                jnp.pad(x8[shift:], ((0, shift), (0, 0))), 0.0)
            x1 = x1 + jnp.where(same[:, None],
                                jnp.pad(x1[shift:], ((0, shift), (0, 0))), 0.0)
            shift *= 2
        starts = jnp.minimum(jnp.cumsum(counts) - counts, cap - 1)
        live = (counts > 0)[:, None]
        return jnp.concatenate([
            jnp.where(live, x8[starts], 0.0),
            jnp.where(live, x1[starts], 0.0)], axis=1)

    @jax.jit
    def variant_a(salt, g, ranks, counts):
        """Current: transpose view -> gather rows."""
        g = g + salt
        rk_sorted, pos = jax.lax.sort(
            (ranks, jnp.arange(CAP, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        gt = g[:, :CAP].T
        x = gt[pos]
        return scan_heads(x, rk_sorted, counts, CAP)

    @jax.jit
    def variant_b(salt, g, ranks, counts):
        """Barrier-forced materialization of the transpose, then gather."""
        g = g + salt
        rk_sorted, pos = jax.lax.sort(
            (ranks, jnp.arange(CAP, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        gt = jax.lax.optimization_barrier(g[:, :CAP].T)
        x = gt[pos]
        return scan_heads(x, rk_sorted, counts, CAP)

    @jax.jit
    def variant_c(salt, g, ranks, counts):
        """Scatter-add baseline (no sort/scan)."""
        g = g + salt
        gt = g[:, :CAP].T
        return jnp.zeros((N, ROWS), jnp.float32).at[ranks].add(
            gt, mode="drop")[:, :9]

    @jax.jit
    def variant_d(salt, g, ranks, counts):
        """Gather only the 9 gradient-carrying rows (width test)."""
        g = g + salt
        rk_sorted, pos = jax.lax.sort(
            (ranks, jnp.arange(CAP, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        gt = g[:9, :CAP].T
        x = jnp.pad(gt[pos], ((0, 0), (0, 7)))
        return scan_heads(x, rk_sorted, counts, CAP)

    for name, fn in [("a: T-view gather (current)", variant_a),
                     ("b: barrier + gather", variant_b),
                     ("c: scatter-add", variant_c),
                     ("d: 9-row gather", variant_d)]:
        print(f"{name}: {timeit(fn, (g, ranks, counts)):7.3f} ms")


if __name__ == "__main__":
    main()
