#!/usr/bin/env python3
"""Primitive-cost measurements on the real chip (dev tool): scatter
variants, gathers, sorts, segmented reductions — the numbers that decide
the binning/reduction architecture."""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from benchlib import timeit

K = 786_432          # live stream rows
N = 100_000          # gaussians
DENSE = 1_600_000    # uncompacted dense slot grid rows

rng = np.random.default_rng(0)
rows = jnp.asarray(rng.normal(size=(K, 16)).astype(np.float32))
ranks = jnp.asarray(rng.integers(0, N, K).astype(np.int32))         # dupes
permq = jnp.asarray(rng.permutation(DENSE)[:K].astype(np.int32))    # unique
perm_small = jnp.asarray(rng.permutation(K).astype(np.int32))       # unique K->K

timeit("scatter-ADD K rows -> N (dupes)", jax.jit(
    lambda s, r: jnp.zeros((N, 16), jnp.float32).at[ranks].add(r + s,
                                                               mode="drop")),
    rows)
timeit("scatter-SET K rows -> DENSE (unique)", jax.jit(
    lambda s, r: jnp.zeros((DENSE, 16), jnp.float32).at[permq].set(
        r + s, mode="drop", unique_indices=True)),
    rows)
timeit("scatter-SET K rows -> K (perm, unique)", jax.jit(
    lambda s, r: jnp.zeros((K, 16), jnp.float32).at[perm_small].set(
        r + s, mode="drop", unique_indices=True)),
    rows)
timeit("gather K rows from DENSE", jax.jit(
    lambda s, r: (r + s)[permq % K][permq % K]),  # two dependent gathers
    rows)
timeit("gather K rows (single)", jax.jit(
    lambda s, r: (r + s)[perm_small]), rows)
timeit("dense reduce DENSE x16 -> N (reshape-sum)", jax.jit(
    lambda s, r: (jnp.zeros((DENSE, 16), jnp.float32) + s).reshape(
        N, 16, 16).sum(axis=1)), rows)
timeit("pair sort (i32,i32) K", jax.jit(
    lambda s, k: jax.lax.sort((k + s.astype(jnp.int32),
                               jnp.arange(K, dtype=jnp.int32)), num_keys=1)),
    jnp.asarray(rng.integers(0, 1 << 30, K).astype(np.int32)))
timeit("single sort i32 K", jax.jit(
    lambda s, k: jax.lax.sort(k + s.astype(jnp.int32))),
    jnp.asarray(rng.integers(0, 1 << 30, K).astype(np.int32)))
# segmented shift-add over K rows, 9 passes
seg = jnp.sort(ranks)
def segscan(s, r):
    x = r + s
    sid = seg
    for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        same = jnp.pad(sid[sh:] == sid[:-sh], (0, sh))
        x = x + jnp.where(same[:, None],
                          jnp.pad(x[sh:], ((0, sh), (0, 0))), 0.0)
    return x
timeit("segmented shift-add 9 passes K rows", jax.jit(segscan), rows)
# 100k-row gather
idxN = jnp.asarray(rng.integers(0, K, N).astype(jnp.int32))
timeit("gather N=100k rows", jax.jit(lambda s, r: (r + s)[idxN]), rows)
# scalar (1-col) gather and scatter for comparison
col = rows[:, 0]
timeit("gather K scalars", jax.jit(lambda s, c: (c + s)[perm_small]), col)
timeit("scatter-ADD K scalars -> N", jax.jit(
    lambda s, c: jnp.zeros((N,), jnp.float32).at[ranks].add(c + s,
                                                            mode="drop")),
    col)
