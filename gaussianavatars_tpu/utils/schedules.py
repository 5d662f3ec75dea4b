"""Learning-rate schedules.

Log-linear (exponential) decay with optional sine-eased delay, equivalent to
the Plenoxels/JaxNeRF schedule the reference uses for the gaussian position
LR (reference utils/general_utils.py:29-62, wired at
scene/gaussian_model.py:223-234).
"""

from __future__ import annotations

import numpy as np


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Evaluate the schedule at `step` (scalar or array; host-side numpy)."""
    step = np.asarray(step, dtype=np.float64)
    if lr_init == 0.0 and lr_final == 0.0:
        return np.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = np.clip(step / max_steps, 0.0, 1.0)
    log_lerp = np.exp(np.log(lr_init) * (1.0 - t) + np.log(lr_final) * t)
    out = delay_rate * log_lerp
    return np.where(step < 0, 0.0, out)


def make_expon_lr_fn(lr_init: float, lr_final: float,
                     lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                     max_steps: int = 1_000_000):
    """Closure form mirroring the reference factory."""

    def fn(step):
        return float(expon_lr(step, lr_init, lr_final, lr_delay_steps,
                              lr_delay_mult, max_steps))

    return fn
