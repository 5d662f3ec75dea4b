"""Nearest-neighbor distance init for unbound gaussian scales.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2` CUDA
extension (sole call site: scene/gaussian_model.py:191 — initial log-scale
from mean squared distance to the 3 nearest neighbors). One-shot at startup,
so a blocked exact top-k over pairwise distances is the right tool: O(N^2)
FLOPs land on the MXU in [block, N] tiles with bounded memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def mean_sq_dist_to_3nn(points: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Mean squared distance from each point to its 3 nearest neighbors.

    Args:
      points: [N, 3] float32.
    Returns:
      [N] float32 (matches distCUDA2's contract).
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if n <= 4:
        d2 = jnp.sum(
            (points[:, None, :] - points[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        k = min(3, max(n - 1, 1))
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top, axis=-1)

    n_pad = -(-n // block) * block
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=jnp.inf)
    sq = jnp.sum(points * points, axis=-1)  # [N]

    def body(i, out):
        chunk = jax.lax.dynamic_slice(pts, (i * block, 0), (block, 3))
        chunk_sq = jnp.sum(chunk * chunk, axis=-1)
        # ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b ; the dot is an MXU matmul
        dots = jnp.matmul(
            chunk, points.T, precision=jax.lax.Precision.HIGHEST
        )  # [block, N]
        d2 = chunk_sq[:, None] + sq[None, :] - 2.0 * dots
        # mask self-distances (and padded rows are inf anyway)
        row_ids = i * block + jnp.arange(block)
        self_mask = row_ids[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, jnp.maximum(d2, 0.0))
        neg_top, _ = jax.lax.top_k(-d2, 3)
        mean3 = jnp.mean(-neg_top, axis=-1)
        return jax.lax.dynamic_update_slice(out, mean3, (i * block,))

    out = jnp.zeros((n_pad,), jnp.float32)
    out = jax.lax.fori_loop(0, n_pad // block, body, out)
    return out[:n]
