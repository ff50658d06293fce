"""Global compute-precision policy (TPU bf16 support).

The reference's AMP/GradScaler (`trainer.py:240-249`) has no TPU analog —
bf16 needs no loss scaling. Setting the policy to 'bfloat16' makes dense
towers (MLPLayers, attention, cross networks) compute in bf16 while
parameters and loss accumulation stay f32. Consulted at trace time, so
flipping the policy triggers a recompile (as expected under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

_POLICY = {"compute_dtype": jnp.float32}


def set_policy(compute_dtype: str | None) -> None:
    _POLICY["compute_dtype"] = {
        None: jnp.float32,
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
    }[compute_dtype]


def compute_dtype():
    return _POLICY["compute_dtype"]
