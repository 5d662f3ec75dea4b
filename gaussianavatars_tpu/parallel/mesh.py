"""Device mesh construction.

Axes (SURVEY.md §2.5 mapping of the canonical strategies onto splatting):
  data  - camera/batch parallelism (grads psum'd across groups)
  prim  - the render-parallel axis: gaussians sharded for projection and
          the optimizer; tile rows sharded for blending (the SP analog —
          the all_gather of projected splats between the two plays the
          role ring-attention plays for KV blocks)

The reference has no distributed path at all (single CUDA device); this
layer is new capability, tested on the virtual CPU mesh and dry-run by the
driver via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_data: int = 1, n_prim: int | None = None,
              devices=None) -> Mesh:
    """('data', 'prim') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_prim is None:
        assert n_total % n_data == 0, (n_total, n_data)
        n_prim = n_total // n_data
    assert n_data * n_prim <= n_total
    grid = np.asarray(devices[: n_data * n_prim]).reshape(n_data, n_prim)
    return Mesh(grid, ("data", "prim"))
