"""Multi-host initialization + metric reduction helpers.

The TPU-native replacement for the reference's process-group bootstrap
(`configurator.py:487-516`: tcp:// rendezvous + NCCL init) and the
all-gather metric map-reduce (`trainer.py:644-666`).

On a TPU pod slice, `initialize_distributed()` wires every host into one
JAX runtime (coordinator from TPU metadata or explicit args); after it,
`jax.devices()` spans the whole slice and the ('data','model') mesh in
`parallel/mesh.py` covers all chips — the rest of the framework is
unchanged (SPMD compilation handles cross-host collectives over ICI/DCN).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, int]:
    """`jax.distributed.initialize` wrapper; no-op on a single host."""
    import jax

    try:
        # CPU backend cross-process collectives need gloo (harmless on
        # TPU: the option only affects the cpu platform). Enables the
        # live multi-process tests and CPU pod-sim runs.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — older builds lack the option
        pass
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def map_reduce_metrics(result: Dict[str, float], num_samples: int):
    """Sample-count-weighted mean of per-process metric dicts
    (`_map_reduce`, `trainer.py:644-666`)."""
    import jax

    if jax.process_count() == 1:
        return result
    from jax.experimental.multihost_utils import process_allgather

    keys = sorted(result.keys())
    vec = np.array([float(result[k]) for k in keys] + [float(num_samples)])
    gathered = process_allgather(vec)  # (P, len+1)
    weights = gathered[:, -1:]
    vals = gathered[:, :-1]
    avg = (vals * weights).sum(axis=0) / np.maximum(weights.sum(), 1.0)
    return {k: float(v) for k, v in zip(keys, avg)}
