"""Process-level JAX configuration: persistent compilation cache.

The axon TPU environment compiles through a remote helper (~minutes per
Pallas kernel), so a persistent on-disk cache is essential for iteration
and for fast bench/train startup. Import this before building any jitted
computation.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "GSAVATARS_JAX_CACHE", os.path.expanduser("~/.cache/gsavatars_jax")
)


def setup(cache_dir: str | None = None) -> None:
    path = cache_dir or _CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here
    # so CPU-forced runs (tests, driver dry runs) actually get CPU.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


setup()
