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


def mesh_active(config) -> bool:
    """The mesh path engages when the user asks for it: `use_mesh: true`,
    an explicit data-axis size, or a model axis > 1 (`--mesh='{"data":4,
    "model":2}'`). Defaults (data -1 / model 1) keep the single-device
    path so laptops and unit tests never pay sharding overhead."""
    if config.get("use_mesh"):
        return True
    m = config.get("mesh", {}) or {}
    return int(m.get("model", 1) or 1) > 1 or int(m.get("data", -1) or -1) > 0


def maybe_mesh_from_config(config, devices=None):
    return mesh_from_config(config, devices) if mesh_active(config) else None


def param_sharding(
    mesh: Mesh, params, row_shard_threshold: int = 4096
):
    """Pytree of NamedShardings: big tables row-sharded, rest replicated."""
    n_model = mesh.shape["model"]

    def rule(path, p):
        if (
            n_model > 1
            and hasattr(p, "ndim")
            and p.ndim == 2
            and p.shape[0] >= row_shard_threshold
            and p.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P("model", None))
        leaf = path[-1].key if path and hasattr(path[-1], "key") else ""
        if (
            n_model > 1
            and leaf == "embedding_sharded"
            and hasattr(p, "ndim")
            and p.ndim == 3
            and p.shape[0] == n_model
        ):
            # ShardedEmbed's (S, V/S, D) mod-sharded layout: axis 0 IS
            # the model axis (parallel/sharded_embedding.py)
            return NamedSharding(mesh, P("model", None, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


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


def pad_batch(batch, multiple: int):
    """Zero-pad every array's leading (batch) axis to a multiple; every
    batcher emits a `weight` column that zero-masks pad rows, so losses
    and metrics are unaffected. Shapes are deterministic per loader, so
    this never triggers a recompile."""

    def pad(v):
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] % multiple:
            extra = (-v.shape[0]) % multiple
            v = np.concatenate(
                [v, np.zeros((extra,) + v.shape[1:], v.dtype)]
            )
        return v

    return {k: pad(v) for k, v in batch.items()}


def place_batch(mesh: Mesh, batch):
    """Assemble a host batch as 'data'-sharded global device arrays.

    Single-process: plain device_put under the NamedSharding. Multi-process
    (pod slice): each process contributes its local rows via
    `jax.make_array_from_process_local_data` — the TPU-native analog of
    the reference's DistributedSampler feeding per-rank DDP replicas
    (`abstract_dataloader.py:59-66`); per-process batchers emit the local
    slice (see data/dataloader.py process sharding)."""
    batch = pad_batch(batch, mesh.shape["data"])
    shardings = batch_sharding(mesh, batch)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, batch, shardings)
    return jax.tree.map(
        lambda v, s: jax.make_array_from_process_local_data(s, v),
        batch,
        shardings,
    )


def put_replicated(mesh: Mesh, x):
    """Place one host array fully-replicated on the mesh. Multi-process:
    every process passes the SAME full array (epoch columns are built
    from the full split on every host) and contributes its addressable
    replicas via `make_array_from_process_local_data`."""
    s = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    return jax.make_array_from_process_local_data(s, np.asarray(x))


def host_local_value(x) -> np.ndarray:
    """Host numpy value of a possibly non-fully-addressable REPLICATED
    array (multi-process jit outputs): read the local replica —
    `jax.device_get` refuses arrays with non-addressable shards."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(jax.device_get(x))


def host_copy(tree):
    """Device pytree → host numpy, gathering non-addressable (cross-host
    sharded) arrays first. Used by checkpointing: the reference writes
    rank-0-only full state (`trainer.py:294-317`); here every process
    reconstructs the global arrays and process 0 writes."""

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                # every process holds full replicas — read the local one
                return np.asarray(x.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(gather, tree)


def local_rows(arr) -> np.ndarray:
    """This process's rows of a leading-axis-sharded global array, in
    shard order — what the local metric collector consumes before the
    cross-process map-reduce. Shards replicated over a second mesh axis
    (e.g. rows 'data'-sharded, 'model'-replicated) appear once per local
    device with the SAME index range — deduplicate by range or every row
    comes back model-axis-many times."""
    if not isinstance(arr, jax.Array) or arr.is_fully_addressable:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
    seen = set()
    parts = []
    for s in shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key in seen:
            continue
        seen.add(key)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0)
