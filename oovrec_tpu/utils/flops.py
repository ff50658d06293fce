"""Model cost estimation (`recbole/utils/utils.py:252-381` get_flops analog).

Instead of torch module hooks, we use jax's own cost analysis on the jitted
loss: XLA reports exact flops for the compiled step, which is *more*
accurate than thop-style per-module counting. Parameter counts come from
the param pytree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def count_params(params) -> int:
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def get_flops(model, variables, batch, estate=None) -> Dict[str, Any]:
    """FLOPs + bytes of one jitted `calculate_loss` call (XLA cost analysis)."""
    import jax.numpy as jnp

    estate = estate or {}

    def f(v, b, es):
        return model.apply(v, b, es, method=model.calculate_loss)

    try:
        lowered = jax.jit(f).lower(variables, batch, estate)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", float("nan")))
        bytes_accessed = float(cost.get("bytes accessed", float("nan")))
    except Exception:
        flops, bytes_accessed = float("nan"), float("nan")
    return {
        "params": count_params(variables.get("params", variables)),
        "flops_per_step": flops,
        "bytes_per_step": bytes_accessed,
    }


def get_environment() -> Dict[str, Any]:
    """RAM/devices report (`utils.py:420` get_environment analog)."""
    import platform

    info: Dict[str, Any] = {"platform": platform.platform()}
    try:
        import psutil

        vm = psutil.virtual_memory()
        info["ram_used_gb"] = round(vm.used / 2**30, 2)
        info["ram_total_gb"] = round(vm.total / 2**30, 2)
        info["cpu_count"] = psutil.cpu_count()
    except ImportError:
        pass
    try:
        devs = jax.devices()
        info["devices"] = [str(d) for d in devs]
        info["device_kind"] = devs[0].device_kind if devs else None
        info["process_count"] = jax.process_count()
    except RuntimeError:
        info["devices"] = []
    return info
