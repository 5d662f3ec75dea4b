"""Adam with per-group learning rates and surgery-friendly state.

Matches the reference's `torch.optim.Adam(..., eps=1e-15)` semantics
(scene/gaussian_model.py:222): eps is added OUTSIDE the sqrt, bias
correction uses a per-optimizer step count, and the moment buffers are plain
pytrees shaped like the params — so the host-side densification surgery in
models/gaussians.py can cat/prune/zero them exactly like the reference does
on torch state dicts (scene/gaussian_model.py:334-424).

Implemented by hand rather than with optax because the surgery + dynamic
per-step LR pytree (xyz follows the log-lerp schedule, reference
train.py:106) are first-class here, not bolted on.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

B1 = 0.9
B2 = 0.999
EPS = 1e-15


def init(params) -> tuple:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return zeros, jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32)


def apply(params, grads, mu, nu, count, lrs):
    """One Adam step.

    Args:
      params/grads/mu/nu: matching pytrees.
      count: scalar int32 step count (pre-increment).
      lrs: pytree of scalar learning rates matching params' structure
        (leaves may be python floats or traced scalars).
    Returns:
      (new_params, new_mu, new_nu, new_count).
    """
    count = count + 1
    c1 = 1.0 - B1 ** count.astype(jnp.float32)
    c2 = 1.0 - B2 ** count.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        m = B1 * m + (1.0 - B1) * g
        v = B2 * v + (1.0 - B2) * (g * g)
        m_hat = m / c1
        v_hat = v / c2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + EPS), m, v

    flat_p, tree = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(mu)
    flat_v = jax.tree.leaves(nu)
    flat_lr = jax.tree.leaves(lrs)
    out_p, out_m, out_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        np_, nm, nv = upd(p, g, m, v, lr)
        out_p.append(np_)
        out_m.append(nm)
        out_v.append(nv)
    return (
        jax.tree.unflatten(tree, out_p),
        jax.tree.unflatten(tree, out_m),
        jax.tree.unflatten(tree, out_v),
        count,
    )
