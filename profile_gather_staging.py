#!/usr/bin/env python3
"""Where is the VMEM-staging cliff for gather sources? (dev tool)

The backward rank-grouped reduction gathers 786k rows from a 50 MB source
at the ~4.5 ns/row random-HBM floor; the forward stream gather reads the
same row count from a 6.4 MB source at ~1.8 ns/row because XLA stages the
source in VMEM. A banded reduction (slice the source, gather per band)
only wins if mid-size slices still stage — this measures rows/s vs source
size at a fixed 786k gathered rows.
"""
import sys
sys.path.insert(0, ".")
import gaussianavatars_tpu.utils.jax_setup  # noqa: F401

import glob
import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

CAP = 786_432
ROWS = 16


def trace_ms(fn, args, iters=20):
    out = fn(jnp.int32(0), *args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="gs_")
    try:
        with jax.profiler.trace(d):
            for i in range(iters):
                out = fn(jnp.int32(i), *args)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
        data = jax.profiler.ProfileData.from_file(files[0])
        total = 0
        for plane in data.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    if "jit_" in ev.name:
                        total += ev.duration_ns
        return total / 1e6 / iters
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    rng = np.random.default_rng(0)
    for n_src in (100_000, 200_000, 400_000, 800_000):
        src = jnp.asarray(rng.normal(size=(n_src, ROWS)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n_src, CAP).astype(np.int32))

        @jax.jit
        def g(salt, s, i):
            return (s + salt.astype(jnp.float32))[i]

        ms = trace_ms(g, (src, idx))
        mb = n_src * ROWS * 4 / 1e6
        # note: the time includes the (bandwidth-bound) salt-add pass over
        # the source; at these sizes it is small next to the gather itself
        print(f"src {mb:6.1f} MB: {ms:6.3f} ms total "
              f"({ms * 1e6 / CAP:5.2f} ns/row incl. salt pass)")


if __name__ == "__main__":
    main()
