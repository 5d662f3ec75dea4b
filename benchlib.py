"""Cache-proof timing helpers for the axon tunnel (dev tool).

The axon plugin appears to serve repeated (executable, same-buffers) calls
from a cache until some pipeline state flips; measurements must (a) vary an
input every call and (b) run after a real-regime trigger (any nontrivial
jit chain). `timeit` feeds a distinct pre-uploaded scalar each iteration.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np


def make_salts(iters):
    # magnitude matters: the salt must survive f32 rounding when added to
    # O(0.1)-magnitude data (ulp(0.13) ~ 1.5e-8; 1e-12 would vanish and
    # hand the dispatch cache identical values — measured as fictitious
    # 0.03 ms "runs")
    return [jnp.float32(1e-6 * (i + 1)) for i in range(iters)]


def timeit(name, fn, *args, iters=30, verbose=True):
    """fn must accept (salt, *args) and fold salt into its computation."""
    salts = make_salts(iters + 1)
    out = fn(salts[-1], *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(salts[i], *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    if verbose:
        print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return dt
