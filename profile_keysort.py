#!/usr/bin/env python3
"""A/B: payload cost of the big binning sort + depth-in-key feasibility.

Current pipeline: depth argsort (100k pair sort) -> rank-packed UNIQUE keys
-> payload-free 1.88M sort, plus a pack permute into rank order and an
inverse-perm sort for the backward. Alternative: pack quantized depth (23
bits at 468 tiles) into the key and carry the gaussian id as a sort
payload — kills the depth sort, the pack permute, and the inverse perm at
the cost of a payload on the big sort. This measures that payload cost.

Wall-clock here is tunnel-cache-prone; run under an xplane trace for truth
(run_and_trace prints module totals).
"""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import collections
import glob
import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

NSLOTS = 1_881_504
N = 100_000


def summarize(trace_dir, label, iters):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    data = jax.profiler.ProfileData.from_file(files[0])
    ops = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                if ev.name.isdigit():
                    continue
                ops[ev.name] += ev.duration_ns
    total = sum(ns for name, ns in ops.items() if "jit_" in name)
    print(f"==== {label}: {total/1e6/iters:.3f} ms/iter ====")
    for name, ns in ops.most_common(6):
        print(f"  {ns/1e6/iters:9.3f} ms  {name[:100]}")


def trace(fn, args, label, iters=30):
    out = fn(jnp.int32(0), *args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix=f"ks_{label}_")
    try:
        with jax.profiler.trace(d):
            for i in range(iters):
                out = fn(jnp.int32(i), *args)
            jax.block_until_ready(out)
        summarize(d, label, iters)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, NSLOTS).astype(np.int32))
    gids = jnp.asarray(rng.integers(0, N, NSLOTS).astype(np.int32))
    depths = jnp.asarray(rng.uniform(0.5, 4.0, N).astype(np.float32))

    @jax.jit
    def sort_single(salt, k):
        return jax.lax.sort(k + salt, is_stable=False)

    @jax.jit
    def sort_pair(salt, k, g):
        return jax.lax.sort((k + salt, g), num_keys=1, is_stable=False)

    CAP = 786_432

    @jax.jit
    def sort_10op(salt, k, g):
        # backward-reduction variant: 9 f32 gradient rows ride as payloads
        k = k[:CAP]
        pay = [(g[:CAP] + i).astype(jnp.float32) for i in range(9)]
        return jax.lax.sort((k + salt, *pay), num_keys=1, is_stable=False)

    @jax.jit
    def depth_chain(salt, d):
        # current per-frame depth machinery: argsort + inverse-perm sort
        key = d + salt.astype(jnp.float32) * 1e-6
        _, perm = jax.lax.sort((key, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        _, inv = jax.lax.sort((perm, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return perm, inv

    trace(sort_single, (keys,), "single_1.88M")
    trace(sort_pair, (keys, gids), "pair_1.88M")
    trace(sort_10op, (keys, gids), "sort10_786k_short", iters=10)
    trace(depth_chain, (depths,), "depth_argsort_plus_inv")


if __name__ == "__main__":
    main()
