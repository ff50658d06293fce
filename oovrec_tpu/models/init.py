"""Parameter initializers matching the reference's scales.

The reference applies `xavier_normal_initialization` to every Embedding /
Linear (`recbole/model/init.py`): std = gain*sqrt(2/(fan_in+fan_out)) with
torch's 2D convention fan_in=dim1, fan_out=dim0. Exact RNG parity is
impossible (different generators) — scale parity is what matters for
quality parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch xavier_normal_ for a 2D (out, in) tensor or (vocab, dim) table."""
    fan_out, fan_in = shape[0], shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_out, fan_in = shape[0], shape[-1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -a, a)


def normal_init(std: float):
    def f(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return f
