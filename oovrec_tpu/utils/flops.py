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


def get_device_usage() -> str:
    """Accelerator memory report (`utils.py:237` get_gpu_usage analog):
    per-device live/peak bytes from the jax memory stats API."""
    parts = []
    try:
        for d in jax.devices():
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats:
                used = stats.get("bytes_in_use", 0) / 2**30
                peak = stats.get("peak_bytes_in_use", 0) / 2**30
                lim = stats.get("bytes_limit", 0) / 2**30
                parts.append(f"{d}: {used:.2f}/{lim:.2f} GB (peak {peak:.2f})")
            else:
                parts.append(f"{d}: n/a")
    except RuntimeError:
        pass
    return "; ".join(parts) or "no devices"


def list_to_latex(convert_list, bigger_flag: bool = True,
                  subset_columns=None):
    """Results table → LaTeX (`utils.py:382` list_to_latex analog): rows of
    {'model':…, metric:value} dicts; best value per column bolded."""
    if not convert_list:
        return "", None
    subset_columns = subset_columns or [
        k for k in convert_list[0] if k != "model"
    ]
    import numpy as _np

    cols = ["model"] + list(subset_columns)
    best = {}
    for c in subset_columns:
        vals = [row.get(c) for row in convert_list if row.get(c) is not None]
        if vals:
            best[c] = max(vals) if bigger_flag else min(vals)
    lines = ["\\begin{tabular}{" + "c" * len(cols) + "}", "\\toprule",
             " & ".join(cols) + " \\\\", "\\midrule"]
    for row in convert_list:
        cells = [str(row.get("model", ""))]
        for c in subset_columns:
            v = row.get(c)
            s = "" if v is None else f"{v:.4f}"
            if v is not None and v == best.get(c):
                s = "\\textbf{" + s + "}"
            cells.append(s)
        lines.append(" & ".join(cells) + " \\\\")
    lines += ["\\bottomrule", "\\end{tabular}"]
    return "\n".join(lines), cols
