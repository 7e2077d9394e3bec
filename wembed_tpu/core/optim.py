"""Gradient-ascent optimizers with cooling.

Exact functional re-implementation of the reference's AdamOptimizer
(reference: src/embeddingLib/src/gradientOptimizer/AdamOptimizer.cpp:18-34):
standard Adam moments with bias correction, the step SCALED by
coolingFactor^t, applied as ASCENT (forces point uphill).  The update order
matters for trajectory parity and is preserved exactly.

Also provides the reference's SimpleOptimizer (clip + cooled learning rate,
SimpleOptimizer.cpp:17-41) for completeness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamParams(NamedTuple):
    learning_rate: float
    cooling_factor: float
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8


def adam_update(
    params: jax.Array,  # (n, d) positions
    grads: jax.Array,  # (n, d) ascent directions
    m: jax.Array,
    v: jax.Array,
    t: jax.Array,  # int32 scalar — step count AFTER increment (t >= 1)
    hp: AdamParams,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Adam ascent step; returns (params, m, v).

    Caller increments ``t`` first (the reference does ``t++`` at the top of
    update, AdamOptimizer.cpp:23).
    """
    dtype = params.dtype
    tf = t.astype(dtype)
    b1 = jnp.asarray(hp.beta1, dtype)
    b2 = jnp.asarray(hp.beta2, dtype)
    cooling = jnp.power(jnp.asarray(hp.cooling_factor, dtype), tf)
    m = hp.beta1 * m + (1.0 - hp.beta1) * grads
    v = hp.beta2 * v + (1.0 - hp.beta2) * grads * grads
    m_hat = m / (1.0 - jnp.power(b1, tf))
    v_hat = v / (1.0 - jnp.power(b2, tf))
    step = cooling * hp.learning_rate * m_hat / (
        jnp.sqrt(v_hat) + jnp.asarray(hp.epsilon, dtype)
    )
    return params + step, m, v


def simple_update(
    params: jax.Array,
    grads: jax.Array,
    t: jax.Array,
    learning_rate: float,
    cooling_factor: float,
    max_displacement: float = 1.0,
) -> jax.Array:
    """Per-coordinate clip then cooled learning rate
    (reference SimpleOptimizer.cpp:17-41)."""
    clipped = jnp.clip(grads, -max_displacement, max_displacement)
    cooling = jnp.power(
        jnp.asarray(cooling_factor, jnp.float32), t.astype(jnp.float32)
    ).astype(params.dtype)
    return params + learning_rate * cooling * clipped
