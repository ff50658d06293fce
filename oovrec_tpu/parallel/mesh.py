"""Device mesh construction + sharding rules.

The reference's only parallelism is NCCL data-parallel DDP
(`RecBole/run_recbole.py:56-68`, `configurator.py:487-516`,
`trainer.py:68-72`). The TPU-native replacement is a single
`jax.sharding.Mesh` with named axes:

  data  — batch dimension (replaces DistributedSampler + DDP all-reduce;
          XLA inserts the gradient psum)
  model — embedding-table row sharding (NEW capability, no reference
          counterpart: the reference replicates every nn.Embedding)

Parameter rule: any 2D param whose row count ≥ `row_shard_threshold` and is
divisible by the model-axis size is sharded P('model', None); everything
else is replicated. Batches shard P('data') on the leading axis. With this,
`jit(step, in_shardings=..., out_shardings=...)` compiles to per-shard
lookups + ICI collectives (all-gather on the gathered rows forward,
reduce-scatter on table grads backward) without any hand-written NCCL-style
code.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model <= 0:
        n_model = 1
    if n_data <= 0:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {n} devices"
        )
    dev_array = np.array(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def mesh_from_config(config, devices=None) -> Mesh:
    m = config.get("mesh", {}) or {}
    return make_mesh(
        int(m.get("data", -1)), int(m.get("model", 1)), devices
    )


def param_sharding(
    mesh: Mesh, params, row_shard_threshold: int = 4096
):
    """Pytree of NamedShardings: big tables row-sharded, rest replicated."""
    n_model = mesh.shape["model"]

    def rule(p):
        if (
            n_model > 1
            and hasattr(p, "ndim")
            and p.ndim == 2
            and p.shape[0] >= row_shard_threshold
            and p.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def batch_sharding(mesh: Mesh, batch):
    """Leading-axis 'data' sharding for every batch array (scalars replicated)."""

    def rule(v):
        if hasattr(v, "ndim") and v.ndim >= 1:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, batch)


def replicated(mesh: Mesh, tree):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_params(mesh: Mesh, params, row_shard_threshold: int = 4096):
    """Place a param pytree onto the mesh under the sharding rule."""
    shardings = param_sharding(mesh, params, row_shard_threshold)
    return jax.tree.map(jax.device_put, params, shardings)
