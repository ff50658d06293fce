"""Row-sharded embedding tables with explicit shard_map exchange.

The north-star parallel component (no reference counterpart — the
reference replicates every nn.Embedding and all-reduces dense grads via
DDP). Two lookup strategies over a ('data','model') mesh:

  * GSPMD path (parallel/train_step.py): annotate shardings, let XLA
    insert collectives — zero code, good baseline.
  * This module: explicit mod-sharded layout + shard_map lookup. Row r
    lives on model-shard (r % S) at local index (r // S). Every model
    shard gathers its owned hits for the batch and a `psum` over 'model'
    assembles the full (B, D) block; the backward pass transposes to a
    local scatter-add + psum — exactly the all-to-all-free "gather and
    reduce" exchange, riding ICI with XLA's tuned all-reduce.

Memory: each shard stores vocab/S rows. Communication per lookup:
one psum of (B, D) on the model axis (upgradable to a true all-to-all
that moves B·D/S — noted for when S is large enough to matter).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_count(mesh: Mesh) -> int:
    return mesh.shape["model"]


def to_sharded_layout(table: np.ndarray, n_shards: int) -> np.ndarray:
    """Dense (V, D) → mod-sharded ((S, V_pad/S, D)) layout (host helper;
    used for checkpoints import/export)."""
    V, D = table.shape
    Vp = -(-V // n_shards) * n_shards
    padded = np.zeros((Vp, D), table.dtype)
    padded[:V] = table
    # shard s holds rows r with r % S == s, ordered by r // S
    return np.stack(
        [padded[s::n_shards] for s in range(n_shards)], axis=0
    )


def from_sharded_layout(sharded: np.ndarray, vocab: int) -> np.ndarray:
    S, rows, D = sharded.shape
    out = np.zeros((S * rows, D), sharded.dtype)
    for s in range(S):
        out[s::S] = sharded[s]
    return out[:vocab]


def make_sharded_lookup(mesh: Mesh):
    """Returns lookup(table_sharded (S, V/S, D) , ids (B,)) → (B, D),
    jit-able under the mesh; differentiable (grads scatter-add into the
    owning shard only)."""

    def _local(table_local, ids):
        # table_local: (1, V/S, D) block of this model shard
        # ids: (B_local,) replicated along 'model'
        s = jax.lax.axis_index("model")
        S = jax.lax.axis_size("model")
        owner = ids % S
        local_idx = ids // S
        tl = table_local[0]
        rows = tl[jnp.clip(local_idx, 0, tl.shape[0] - 1)]
        hit = (owner == s)[:, None].astype(rows.dtype)
        partial = rows * hit
        return jax.lax.psum(partial, "model")

    lookup = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("model", None, None), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return lookup


def place_sharded_table(mesh: Mesh, table: np.ndarray) -> jax.Array:
    S = shard_count(mesh)
    layout = to_sharded_layout(np.asarray(table), S)
    return jax.device_put(
        layout, NamedSharding(mesh, P("model", None, None))
    )
