"""Small vector helpers (reference utils/vector_ops.py equivalents).

Differentiation-safe versions: clamps sit inside the sqrt so the zero
vector has zero (not NaN) gradients.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * dot(x, n) * n - x


def length(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(x, x), eps))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / length(x, eps)


def to_hvec(x: jnp.ndarray, w: float) -> jnp.ndarray:
    pad = jnp.full(x.shape[:-1] + (1,), w, x.dtype)
    return jnp.concatenate([x, pad], axis=-1)
