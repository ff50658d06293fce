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

from typing import Any

import flax.linen as nn
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


def make_alltoall_lookup(mesh: Mesh, capacity_factor: float = 2.0):
    """True all-to-all variant of `make_sharded_lookup` (same signature:
    ids replicated along 'model', (B, D) out) — the upgrade point noted in
    the module docstring.

    Exchange per model group of size S (batch slice b = B/data):
      1. each model shard takes its b/S slice of the batch and sorts the
         ids by owning shard (owner = id % S),
      2. a (S, C) id all_to_all requests rows from their owners
         (C = capacity_factor · b/S² per destination),
      3. owners gather the rows locally and a (S, C, D) all_to_all
         returns them; an inverse permutation restores batch order,
      4. an all_gather over 'model' reassembles the (b, D) block.

    Traffic per device ≈ C·S·D + b·D/S·(S-1)  ≈  b·D·(f/S + 1), vs the
    psum path's all-reduce ≈ 2·b·D — about half at f=2, and the b·D/S
    ideal once callers keep the batch 'model'-sharded downstream (then
    step 4 disappears).

    Ids whose destination bucket overflows C receive ZERO rows and are
    counted in the second return value (per-device overflow total, psum'd)
    — callers treat nonzero overflow as a sizing error. With mod-sharding
    of remapped contiguous ids, ownership of a batch is near-binomial, so
    f=2 puts overflow below ~1e-9 for b/S² ≳ 64; popularity skew does not
    concentrate mod S.
    """

    def _local(table_local, ids):
        S = jax.lax.axis_size("model")
        s = jax.lax.axis_index("model")
        b = ids.shape[0]
        assert b % S == 0, (
            f"per-data-shard batch {b} must divide the model axis {S}"
        )
        bs = b // S
        C = max(1, int(np.ceil(capacity_factor * bs / S)))
        tl = table_local[0]
        D = tl.shape[1]

        my_ids = jax.lax.dynamic_slice(ids, (s * bs,), (bs,))
        owner = my_ids % S
        local_idx = my_ids // S
        order = jnp.argsort(owner)  # stable: ties keep batch order
        s_owner = owner[order]
        s_local = local_idx[order]
        # rank within the destination group
        start = jnp.searchsorted(s_owner, jnp.arange(S))
        pos = jnp.arange(bs) - start[s_owner]
        valid = pos < C

        # (S+1, C) so overflow entries land in a discard row
        buf = jnp.zeros((S + 1, C), my_ids.dtype)
        buf = buf.at[
            jnp.where(valid, s_owner, S), jnp.where(valid, pos, 0)
        ].set(s_local, mode="drop")
        req = jax.lax.all_to_all(
            buf[:S], "model", split_axis=0, concat_axis=0, tiled=True
        )  # (S, C): row t = local row indices peer t asks of me
        rows = tl[jnp.clip(req.reshape(-1), 0, tl.shape[0] - 1)]
        resp = jax.lax.all_to_all(
            rows.reshape(S, C, D), "model",
            split_axis=0, concat_axis=0, tiled=True,
        )  # (S, C, D): row t = rows owner t returned for my requests
        got_sorted = resp[s_owner, jnp.where(valid, pos, 0)]
        got_sorted = got_sorted * valid[:, None].astype(got_sorted.dtype)
        block = jnp.zeros((bs, D), got_sorted.dtype).at[order].set(got_sorted)

        out = jax.lax.all_gather(
            block, "model", axis=0, tiled=True
        )  # (b, D) in batch order
        overflow = jax.lax.psum(jnp.sum(~valid), "model")
        return out, overflow

    lookup = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P("model", None, None), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    return lookup


def place_sharded_table(mesh: Mesh, table: np.ndarray) -> jax.Array:
    S = shard_count(mesh)
    layout = to_sharded_layout(np.asarray(table), S)
    return jax.device_put(
        layout, NamedSharding(mesh, P("model", None, None))
    )


class ShardedEmbed(nn.Module):
    """Production flax twin of `nn.Embed` holding its table in the
    mod-sharded (S, V_pad/S, D) layout and looking rows up through the
    explicit shard_map exchange (`make_lookup`, config key
    `sharded_lookup: psum|alltoall|auto`). Dense row r of the logical
    (V, D) table lives at [r % S, r // S]; `dense()` reassembles the
    logical table (one transpose-reshape — GSPMD inserts the all-gather)
    for consumers that need the whole table (full-sort eval, mean/knn
    embedders)."""

    num_embeddings: int
    features: int
    mesh: Mesh
    kind: str = "auto"            # psum | alltoall | auto (S>=4 → alltoall)
    embedding_init: Any = None

    def setup(self):
        S = self.mesh.shape["model"]
        rows = -(-self.num_embeddings // S)
        init = self.embedding_init
        if init is None:
            init = nn.initializers.normal(stddev=0.02)

        # initialize at the LOGICAL (V_pad, D) shape, then fold into the
        # mod-sharded layout (layout[s, i] = dense[i*S + s], exactly
        # `to_sharded_layout`): shape-dependent initializers (xavier's
        # fan is computed from the shape) would otherwise see a 3D shape
        # with receptive_field_size=S and produce a different stddev
        # than the dense table (ADVICE r4 #2). Remaining delta vs a dense
        # (V, D) init: the ≤S-1 padding rows enter the fan computation —
        # O(S/V), negligible at any real vocab.
        def sharded_init(key, shape, *args):
            s_, rows_, d = shape
            dense = init(key, (s_ * rows_, d), *args)
            return jnp.transpose(dense.reshape(rows_, s_, d), (1, 0, 2))

        self.embedding_sharded = self.param(
            "embedding_sharded", sharded_init, (S, rows, self.features)
        )

    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        flat = ids.reshape(-1)
        # the exchange partitions ids over 'data' and (alltoall) slices
        # each block over 'model' — pad to a whole-mesh multiple
        m = self.mesh.shape["data"] * self.mesh.shape["model"]
        pad = (-flat.shape[0]) % m
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
        out = make_lookup(self.mesh, self.kind)(
            self.embedding_sharded, flat
        )
        if pad:
            out = out[: ids.size]
        return out.reshape(ids.shape + (self.features,))

    def dense(self) -> jnp.ndarray:
        """Logical (V, D) table: reshape index i*S+s ↔ row r with
        s = r % S, i = r // S — exactly `from_sharded_layout`."""
        S, rows, D = self.embedding_sharded.shape
        return jnp.transpose(self.embedding_sharded, (1, 0, 2)).reshape(
            S * rows, D
        )[: self.num_embeddings]

    @property
    def embedding(self) -> jnp.ndarray:
        """`nn.Embed.embedding` drop-in for dense consumers."""
        return self.dense()


def reconcile_layouts(target_tree, raw_state) -> None:
    """Convert stored embedding-table layouts IN PLACE inside a
    msgpack-restored state dict so it matches the current param tree
    (ADVICE r4 #4): a checkpoint written with `sharded_lookup != gspmd`
    stores `embedding_sharded` (S, V_pad/S, D); resuming it into a dense
    model (or onto a mesh with a different model-axis size) — or the
    reverse — would fail structurally in `from_state_dict`. Handles:

      * stored sharded → target dense `embedding` (V, D)
      * stored dense   → target sharded (S, rows, D)
      * sharded → sharded with a different S (via the dense form)

    Works on any nested dict (params AND optimizer-state subtrees whose
    leaves mirror the param layout, e.g. adam mu/nu)."""

    def dense_of(stored: np.ndarray, vocab: int) -> np.ndarray:
        return from_sharded_layout(np.asarray(stored), vocab)

    def walk(tgt, raw):
        if not isinstance(tgt, dict) or not isinstance(raw, dict):
            return
        if "embedding" in tgt and "embedding_sharded" in raw:
            stored = raw.pop("embedding_sharded")
            if np.ndim(stored) == 3 and np.ndim(tgt["embedding"]) == 2:
                v = int(np.shape(tgt["embedding"])[0])
                raw["embedding"] = dense_of(stored, v)
            else:  # scalar/structural leaves (e.g. per-param adam counts)
                raw["embedding"] = stored
        elif "embedding_sharded" in tgt and "embedding" in raw:
            stored = raw.pop("embedding")
            shp = np.shape(tgt["embedding_sharded"])
            if np.ndim(stored) == 2 and len(shp) == 3:
                s, rows = int(shp[0]), int(shp[1])
                raw["embedding_sharded"] = to_sharded_layout(
                    np.asarray(stored), s
                )[:, :rows]
            else:
                raw["embedding_sharded"] = stored
        elif (
            "embedding_sharded" in tgt
            and "embedding_sharded" in raw
            and np.ndim(raw["embedding_sharded"]) == 3
            and tuple(np.shape(tgt["embedding_sharded"]))
            != tuple(np.shape(raw["embedding_sharded"]))
        ):
            s, rows, _d = np.shape(tgt["embedding_sharded"])
            stored = np.asarray(raw["embedding_sharded"])
            dense = dense_of(stored, stored.shape[0] * stored.shape[1])
            raw["embedding_sharded"] = to_sharded_layout(
                dense, int(s)
            )[:, : int(rows)]
        for k, sub in tgt.items():
            if k in raw:
                walk(sub, raw[k])

    walk(target_tree, raw_state)


def make_lookup(mesh: Mesh, kind: str = "auto",
                capacity_factor: float = 2.0):
    """Strategy selector (config key `sharded_lookup: auto|psum|alltoall`).

    Traffic per device: psum all-reduce ≈ 2·b·D·(S−1)/S; all-to-all ≈
    b·D·(f/S + (S−1)/S) with the trailing all_gather. At S=2 those are
    ≈b·D vs ≈1.5·b·D (psum wins); at S=4 ≈1.5·b·D vs ≈1.25·b·D and the
    gap widens with S — so `auto` switches to all-to-all at S ≥ 4
    (measured A/B in docs/DESIGN.md). All-to-all lookups return
    (out, overflow); this wrapper normalizes both kinds to `out` and
    asserts-by-construction that psum has no overflow path.
    """
    S = shard_count(mesh)
    if kind == "auto":
        kind = "alltoall" if S >= 4 else "psum"
    if kind == "psum":
        f = make_sharded_lookup(mesh)
        return lambda table, ids: f(table, ids)
    if kind == "alltoall":
        f = make_alltoall_lookup(mesh, capacity_factor)
        return lambda table, ids: f(table, ids)[0]
    raise ValueError(f"unknown sharded_lookup kind [{kind}]")
