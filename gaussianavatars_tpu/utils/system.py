"""System utilities: seeded+timestamped runtime state, profiling hooks.

Equivalents of reference utils/general_utils.py:112-133 (safe_state) and
utils/system_utils.py, plus jax.profiler tracing (the TPU-native upgrade of
the reference's CUDA-event timing, SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import os
import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool = False, seed: int = 0):
    """Seed all host RNGs and timestamp every stdout line."""
    old_stdout = sys.stdout

    class _Stamped:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                old_stdout.write(x.replace("\n", f" [{stamp}]\n"))
            else:
                old_stdout.write(x)

        def flush(self):
            old_stdout.flush()

    sys.stdout = _Stamped()
    random.seed(seed)
    np.random.seed(seed)


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str) -> int:
    """reference utils/system_utils.py:26-28."""
    return max(int(f.split("_")[-1]) for f in os.listdir(folder))


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace scope (view with xprof/tensorboard).

    No-op when log_dir is falsy, so call sites can pass the CLI flag
    straight through."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
