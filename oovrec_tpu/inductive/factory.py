"""Embedder state construction (factory) + feature cache.

Equivalent of `recbole/inductive/get_inductive.py:16-138` +
`feature_cache.py` + the feature-matrix assembly inside
`lsh_embedder.py:83-106`. Instead of stateful embedder objects, we build an
`EmbedderState`: a dict of host/device arrays that is passed explicitly
into jitted model functions and checkpointed alongside params.

Keys (present depending on spec):
  user_feat_mat / item_feat_mat   (n_entities, F) float32  — normalized
  user_planes / item_planes       (hash_size, F) float32   — LSH hyperplanes
  user_knn_neighbors / item_knn_neighbors (n_entities, k) int32
  user_dhe_keys / item_dhe_keys   (num_hashes, 2) uint64   — SipHash keys
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.utils.seeding import host_rng

EmbedderState = Dict[str, np.ndarray]

_EPS = 1e-12


def build_feature_matrix(
    feat_frame, id_field: str, normalization_type: str = "per-feature"
) -> np.ndarray:
    """hstack all non-ID feature columns with the reference's normalization.

    Mirrors `lsh_embedder.py:83-104`: each column is viewed (n, -1) and
    L2-normalized along the last dim ('per-feature'), or the full hstack is
    row-normalized ('global'), or left raw ('none'). Token ids participate
    as raw float values, exactly like the reference.
    """
    if feat_frame is None:
        raise ValueError("feature matrix requested but no feature file loaded")
    cols = [c for c in feat_frame.columns if c != id_field]
    blocks = []
    for c in cols:
        if c.endswith("__bucket"):
            continue  # folded into its value column's block below
        if c + "__bucket" in feat_frame.columns:
            # discretized numerical feature: the reference's (value, bucket)
            # pair participates as one 2-wide block, normalized together
            pair = np.stack(
                [
                    feat_frame[c].values.astype(np.float32),
                    feat_frame[c + "__bucket"].values.astype(np.float32),
                ],
                axis=-1,
            )
            if normalization_type == "per-feature":
                norm = np.linalg.norm(pair, axis=-1, keepdims=True)
                pair = pair / np.maximum(norm, _EPS)
            blocks.append(pair)
            continue
        col = feat_frame[c].values
        if col.dtype == object:  # seq field: pad to max len
            maxlen = max((len(v) for v in col), default=0)
            arr = np.zeros((len(col), max(maxlen, 1)), dtype=np.float32)
            for i, v in enumerate(col):
                arr[i, : len(v)] = np.asarray(v, dtype=np.float32)
        else:
            arr = col.astype(np.float32).reshape(len(col), -1)
        if normalization_type == "per-feature":
            norm = np.linalg.norm(arr, axis=-1, keepdims=True)
            arr = arr / np.maximum(norm, _EPS)
        blocks.append(arr)
    mat = np.hstack(blocks).astype(np.float32)
    if normalization_type == "global":
        norm = np.linalg.norm(mat, axis=-1, keepdims=True)
        mat = mat / np.maximum(norm, _EPS)
    elif normalization_type not in ("per-feature", "none", "global"):
        raise ValueError(f"Invalid normalization type: {normalization_type}")
    return mat


def exact_knn_neighbors(
    query_feats: np.ndarray, corpus_feats: np.ndarray, k: int,
    exclude_self_rows: bool = False,
) -> np.ndarray:
    """Exact dot-product top-k neighbor ids (ScaNN replacement).

    The reference uses approximate ScaNN search (`knn_embedder.py:84-93`);
    corpora here are small enough that exact search on normalized features
    is both simpler and strictly more accurate. Row 0 of the corpus (PAD)
    is excluded as a neighbor.
    """
    sims = query_feats @ corpus_feats.T  # (Q, N)
    sims[:, 0] = -np.inf
    if exclude_self_rows:
        n = min(sims.shape[0], sims.shape[1])
        sims[np.arange(n), np.arange(n)] = -np.inf
    idx = np.argpartition(-sims, kth=min(k, sims.shape[1] - 1), axis=1)[:, :k]
    # order the k by similarity desc
    part = np.take_along_axis(sims, idx, axis=1)
    order = np.argsort(-part, axis=1, kind="stable")
    return np.take_along_axis(idx, order, axis=1).astype(np.int32)


class InductiveFeatureCache:
    """Shared feature matrices keyed by mode (`feature_cache.py:1-22`)."""

    def __init__(self, mode: str = "transductive"):
        self.mode = mode
        self._user: Optional[np.ndarray] = None
        self._item: Optional[np.ndarray] = None

    def has_cached(self) -> bool:
        return self._user is not None and self._item is not None

    def get_cached(self):
        return self._user, self._item

    def add_to_cache(self, user_feats, item_feats) -> None:
        self._user = user_feats
        self._item = item_feats


_global_cache = InductiveFeatureCache()


def get_feature_cache(mode: str) -> InductiveFeatureCache:
    """Module-global cache, rebuilt when mode flips (`get_inductive.py:14,46-50`)."""
    global _global_cache
    if _global_cache.mode != mode:
        _global_cache = InductiveFeatureCache(mode)
    return _global_cache


def build_embedder_state(
    spec: InductiveSpec,
    dataset,
    n_original_users: int,
    n_original_items: int,
    mode: str = "transductive",
    seed: int = 2020,
    cache: Optional[InductiveFeatureCache] = None,
    hash_key_dir: str = "./hash_keys",
) -> EmbedderState:
    """Build the non-trainable embedder state for `mode`.

    In 'transductive' mode feature matrices cover the training entities;
    in 'inductive' mode they cover the full `_ind` corpus (old + new rows,
    vocab-reconciled). LSH hyperplanes are drawn once per run from a
    seed-stable stream and must round-trip through checkpoints (reference
    pickles them, `torch_hash.py:44-50`).
    """
    state: EmbedderState = {
        "n_original_users": np.int64(n_original_users),
        "n_original_items": np.int64(n_original_items),
    }
    if spec.embedder in ("dhe", "fdhe"):
        from oovrec_tpu.inductive.dhe import DHEHasher

        hasher = DHEHasher(spec.dhe_num_hashes, hash_key_dir)
        # uint64 keys are host-only state (never shipped to the device);
        # persisted in checkpoints AND in the reference-compatible
        # hash_keys/<n>.hashes file
        state["dhe_keys"] = hasher.keys
    if not spec.needs_features and spec.embedder not in ("lsh", "slsh"):
        return state

    cache = cache or get_feature_cache(mode)
    if cache.has_cached():
        user_mat, item_mat = cache.get_cached()
    else:
        user_mat = build_feature_matrix(
            dataset.user_feat, dataset.uid_field, spec.normalization_type
        )
        item_mat = build_feature_matrix(
            dataset.item_feat, dataset.iid_field, spec.normalization_type
        )
        cache.add_to_cache(user_mat, item_mat)
    state["user_feat_mat"] = user_mat
    state["item_feat_mat"] = item_mat

    if spec.embedder in ("lsh", "slsh"):
        rng = host_rng(seed, f"lsh_planes")
        if spec.embedder == "lsh":
            u_bits, i_bits = spec.n_user_buckets, spec.n_item_buckets
        else:
            u_bits = int(np.ceil(np.log2(spec.n_user_buckets)))
            i_bits = int(np.ceil(np.log2(spec.n_item_buckets)))
        state["user_planes"] = rng.standard_normal(
            (u_bits, user_mat.shape[1])
        ).astype(np.float32)
        state["item_planes"] = rng.standard_normal(
            (i_bits, item_mat.shape[1])
        ).astype(np.float32)

    if spec.embedder == "knn":
        # neighbors among IV entities only (`knn_embedder.py:84-93` indexes
        # IV rows); every entity (IV + OOV) gets a precomputed neighbor list.
        iv_user = user_mat[:n_original_users]
        iv_item = item_mat[:n_original_items]
        state["user_knn_neighbors"] = exact_knn_neighbors(
            user_mat, iv_user, spec.knn_neighbors
        )
        state["item_knn_neighbors"] = exact_knn_neighbors(
            item_mat, iv_item, spec.knn_neighbors
        )
    return state
