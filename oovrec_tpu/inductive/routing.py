"""Branchless on-device IV/OOV embedding routing.

The heart of the inductive layer on TPU. The reference partitions each ID
batch with boolean masks and scatters per-subset results back
(`bpr.py:48-125`, dynamic shapes); here every row computes BOTH the IV
lookup and the OOV embedding and a `jnp.where` on the OOV predicate selects
— same math, fully static shapes, fuses into the surrounding matmuls.

Embedder semantics (reference file:line):
  bucket  — `user_oov_buckets(mapped - n)` (`bpr.py:76,124`)
  zero    — 0-vector (`zero_embedder.py:36-60`)
  mean    — column-mean of the IV table (`mean_embedder.py:53-61`)
  lsh     — multi-hot sign(feat@planesᵀ); mean of selected bucket rows
            (`lsh_embedder.py:141-179`)
  slsh    — single bucket id = (2**bits).sum() % n_buckets =
            (n_bits + popcount) % n_buckets (`single_lsh_embedder.py:82-101`)
  dnn     — MLP(features) (`dnn_embedder.py:65-90`)
  dhe     — MLP(siphash columns) (`dh_embedder.py:70-152`)
  fdhe    — MLP([siphash ∥ features]) (`feat_dh_embedder.py:108-197`)
  knn     — mean of IV table rows of k nearest feature neighbors
            (`knn_embedder.py:110-144`), neighbors precomputed exactly
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from oovrec_tpu.inductive.spec import InductiveSpec


def oov_embedding(
    spec: InductiveSpec,
    side: str,                      # 'user' | 'item'
    ids: jnp.ndarray,               # (B,) raw ids (feature-matrix rows)
    buckets: Optional[jnp.ndarray], # (B,) host-hashed mapper buckets
    iv_table: Optional[jnp.ndarray],  # (n_vocab, D); None with a sharded
                                    # IV lookup unless the embedder needs
                                    # the dense table (mean/knn)
    bucket_table: Optional[jnp.ndarray],  # (n_buckets, D) or None
    estate: Dict[str, jnp.ndarray],
    mlp_apply=None,                 # callable(feats_or_hashes) for dnn/dhe/fdhe
    dhe_hashes: Optional[jnp.ndarray] = None,  # (B, num_hashes) f32
    out_dim: Optional[int] = None,  # D when iv_table is None
) -> jnp.ndarray:
    """Compute the OOV embedding for every row (selection happens later)."""
    from oovrec_tpu.ops.embed_grad import gather_rows

    emb = spec.embedder
    if iv_table is not None:
        out_dim, dt = iv_table.shape[1], iv_table.dtype
    else:
        dt = bucket_table.dtype if bucket_table is not None else jnp.float32
    if emb is None:
        return gather_rows(bucket_table, buckets)
    if emb == "zero":
        return jnp.zeros((ids.shape[0], out_dim), dt)
    if emb == "mean":
        m = jax.lax.stop_gradient(jnp.mean(iv_table, axis=0))
        return jnp.broadcast_to(m, (ids.shape[0], iv_table.shape[1]))
    if emb == "knn":
        neigh = estate[f"{side}_knn_neighbors"][ids]  # (B, k)
        return jax.lax.stop_gradient(jnp.mean(iv_table[neigh], axis=1))
    if emb in ("lsh", "slsh"):
        feats = estate[f"{side}_feat_mat"][ids]       # (B, F)
        planes = estate[f"{side}_planes"]             # (bits, F)
        proj = feats @ planes.T                       # (B, bits)
        bits = (proj >= 0).astype(iv_table.dtype)     # sign→{0,1}, 0 counts as 1
        if emb == "lsh":
            multihot = bits                           # (B, n_buckets)
            denom = jnp.maximum(jnp.sum(multihot, axis=1, keepdims=True), 1.0)
            return (multihot @ bucket_table) / denom
        # slsh: the reference's (2**bits).sum() = n_bits + popcount
        n_buckets = bucket_table.shape[0]
        bucket_id = (
            bits.shape[1] + jnp.sum(bits, axis=1).astype(jnp.int32)
        ) % n_buckets
        return bucket_table[bucket_id]
    if emb == "dnn":
        feats = estate[f"{side}_feat_mat"][ids]
        return mlp_apply(feats)
    if emb == "dhe":
        return mlp_apply(dhe_hashes)
    if emb == "fdhe":
        feats = estate[f"{side}_feat_mat"][ids]
        return mlp_apply(jnp.concatenate([dhe_hashes, feats], axis=-1))
    raise NotImplementedError(f"embedder [{emb}] not supported")


def route(
    spec: Optional[InductiveSpec],
    side: str,
    ids: jnp.ndarray,
    oov_flags: Optional[jnp.ndarray],
    buckets: Optional[jnp.ndarray],
    iv_table: Optional[jnp.ndarray],
    bucket_table: Optional[jnp.ndarray] = None,
    estate: Optional[Dict[str, jnp.ndarray]] = None,
    mlp_apply=None,
    dhe_hashes: Optional[jnp.ndarray] = None,
    iv_lookup=None,
    iv_vocab: Optional[int] = None,
    out_dim: Optional[int] = None,
) -> jnp.ndarray:
    """IV/OOV-routed embedding lookup.

    `oov = flag | (id >= n_vocab)`; IV side clips ids into the table (the
    clipped rows are discarded by the select). With `iv_lookup` (the
    explicit row-sharded exchange, parallel/sharded_embedding.ShardedEmbed)
    the IV gather goes through the callable instead of a dense table;
    `iv_table` is then only required for embedders that read the whole
    table (mean/knn) and may otherwise be None.
    """
    from oovrec_tpu.ops.embed_grad import gather_rows

    n_vocab = iv_vocab if iv_lookup is not None else iv_table.shape[0]
    gather = iv_lookup if iv_lookup is not None else (
        # one-hot-matmul backward: the dense scatter-add grads of the IV
        # tables were ~30% of the profiled BPR step (EXPERIMENTS round 4)
        lambda c: gather_rows(iv_table, c)
    )
    if spec is None or not spec.active:
        return gather(ids)
    is_oov = ids >= n_vocab
    if oov_flags is not None:
        is_oov = is_oov | (oov_flags > 0)
    if buckets is None:
        # batches without annotations (plain transductive training): the
        # OOV side is still computed (branchless) but never selected unless
        # an id exceeds the vocab — bucket 0 is a safe placeholder.
        buckets = jnp.zeros_like(ids)
    if spec.embedder in ("dhe", "fdhe") and dhe_hashes is None:
        dhe_hashes = jnp.zeros(
            (ids.shape[0], spec.dhe_num_hashes),
            iv_table.dtype if iv_table is not None else jnp.float32,
        )
    iv_e = gather(jnp.clip(ids, 0, n_vocab - 1))
    oov_e = oov_embedding(
        spec, side, ids, buckets, iv_table, bucket_table, estate or {},
        mlp_apply=mlp_apply, dhe_hashes=dhe_hashes,
        out_dim=out_dim if out_dim is not None else iv_e.shape[-1],
    )
    return jnp.where(is_oov[:, None], oov_e.astype(iv_e.dtype), iv_e)
