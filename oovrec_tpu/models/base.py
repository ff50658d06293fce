"""Model base classes and shared plumbing.

Equivalent of `recbole/model/abstract_recommender.py` re-designed as flax
linen modules with pure methods:

  calculate_loss(batch, estate)  -> scalar (weight-masked mean)
  predict(batch, estate)         -> (B,) scores
  user_e / item_e                -> routed embedding lookups
  all_item_embeddings(ids, buckets, estate) -> (N, D) for full-sort eval

The IV/OOV routing of `InductiveGeneralRecommender`
(`abstract_recommender.py:117-203`) lives in `inductive.routing`; models
call it through `self._route`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.inductive.routing import route
from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.utils.enums import InputType, ModelType

Batch = Dict[str, jnp.ndarray]


class EmbedderMLP(nn.Module):
    """The DHE/fDHE/DNN encoder tower: widths³ GELU + final Sigmoid
    (`dh_embedder.py:70-89`, `dnn_embedder.py:65-90`)."""

    layer_size: int
    out_size: int
    n_hidden: int = 3

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_hidden):
            x = nn.Dense(self.layer_size, kernel_init=xavier_normal)(x)
            x = nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)
        x = nn.Dense(self.out_size, kernel_init=xavier_normal)(x)
        return nn.sigmoid(x)


class GeneralRecommender(nn.Module):
    """Two-tower base (user/item ID spaces, optional inductive routing)."""

    model_type = ModelType.GENERAL
    input_type = InputType.POINTWISE

    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    spec: Optional[InductiveSpec] = None
    uid_field: str = "user_id"
    iid_field: str = "item_id"
    label_field: str = "label"
    neg_prefix: str = "neg_"
    # explicit row-sharded lookup (config `sharded_lookup`): 'gspmd' keeps
    # annotate-only sharding; 'psum'/'alltoall'/'auto' route big ID tables
    # through the shard_map exchange (parallel/sharded_embedding)
    sharded_lookup: str = "gspmd"
    sharded_mesh: Any = None
    row_shard_threshold: int = 4096

    def _embed_table(self, vocab: int, name: str):
        """nn.Embed, or ShardedEmbed (mod-sharded layout + explicit
        exchange) when `sharded_lookup != 'gspmd'` under an active mesh
        and the table crosses the row-shard threshold."""
        if (
            self.sharded_mesh is not None
            and self.sharded_lookup not in ("gspmd", None)
            and self.sharded_mesh.shape.get("model", 1) > 1
            and vocab >= self.row_shard_threshold
        ):
            from oovrec_tpu.parallel.sharded_embedding import ShardedEmbed

            return ShardedEmbed(
                num_embeddings=vocab, features=self.embedding_size,
                mesh=self.sharded_mesh, kind=self.sharded_lookup,
                embedding_init=xavier_normal, name=name,
            )
        return nn.Embed(
            vocab, self.embedding_size,
            embedding_init=xavier_normal, name=name,
        )

    def _setup_oov(self):
        """Create OOV bucket tables / embedder MLPs per the spec
        (`abstract_recommender.py:134-139`)."""
        spec = self.spec
        if spec is None or not spec.active:
            return
        if spec.needs_buckets:
            self.user_oov_buckets = nn.Embed(
                spec.n_user_buckets, self.embedding_size,
                embedding_init=xavier_normal, name="user_oov_buckets",
            )
            self.item_oov_buckets = nn.Embed(
                spec.n_item_buckets, self.embedding_size,
                embedding_init=xavier_normal, name="item_oov_buckets",
            )
        if spec.trainable_embedder:
            self.user_oov_mlp = EmbedderMLP(
                spec.dhe_layer_size, self.embedding_size, name="user_oov_mlp"
            )
            self.item_oov_mlp = EmbedderMLP(
                spec.dhe_layer_size, self.embedding_size, name="item_oov_mlp"
            )

    def _route_side(self, side: str, iv, ids, batch: Batch, estate,
                    field: str):
        """`iv` may be a dense (V, D) table (the historical API), an
        nn.Embed, or a ShardedEmbed — the latter routes the IV gather
        through the explicit row-sharded exchange and only densifies for
        embedders that read the whole table (mean/knn).

        Sparse fast path (train/sparse_update.py): a batch key
        `_sparse_rows_<side>` carries PRE-GATHERED table rows (n, D) with
        the id fields remapped to row positions — the step differentiates
        w.r.t. those rows directly (no dense (V, D) cotangent), and the
        row-sparse adam writes only touched rows back. Training-time
        only; requires ids < vocab (all training paths) and an embedder
        that never reads the whole table (not mean/knn)."""
        spec = self.spec
        rows_override = (
            batch.get("_sparse_rows_" + side)
            if isinstance(batch, dict) else None
        )
        flags = batch.get(field + "_oov") if spec and spec.active else None
        buckets = batch.get(field + "_bucket") if spec and spec.active else None
        bucket_table = None
        mlp = None
        dhe = None
        if spec and spec.active:
            if spec.needs_buckets:
                bucket_table = (
                    self.user_oov_buckets.embedding
                    if side == "user"
                    else self.item_oov_buckets.embedding
                )
            if spec.trainable_embedder:
                mlp = (
                    self.user_oov_mlp if side == "user" else self.item_oov_mlp
                )
            if spec.embedder in ("dhe", "fdhe"):
                dhe = dhe_hashes_for(batch, field, estate)
        iv_lookup = iv_vocab = None
        iv_table = iv
        from oovrec_tpu.parallel.sharded_embedding import ShardedEmbed

        if rows_override is not None:
            assert not (
                spec and spec.active and spec.embedder in ("mean", "knn")
            ), "sparse row override cannot serve whole-table embedders"
            return route(
                spec, side, ids, flags, buckets, rows_override,
                bucket_table, estate, mlp_apply=mlp, dhe_hashes=dhe,
                out_dim=self.embedding_size,
            )
        if isinstance(iv, ShardedEmbed):
            iv_lookup, iv_vocab = iv, iv.num_embeddings
            needs_dense = bool(
                spec and spec.active and spec.embedder in ("mean", "knn")
            )
            iv_table = iv.dense() if needs_dense else None
        elif isinstance(iv, nn.Embed):
            iv_table = iv.embedding
        return route(
            spec, side, ids, flags, buckets, iv_table, bucket_table,
            estate, mlp_apply=mlp, dhe_hashes=dhe,
            iv_lookup=iv_lookup, iv_vocab=iv_vocab,
            out_dim=self.embedding_size,
        )

    # Methods models must provide:
    def calculate_loss(self, batch: Batch, estate=None):
        raise NotImplementedError

    def predict(self, batch: Batch, estate=None):
        raise NotImplementedError


def dhe_hashes_for(batch: Batch, field: str, estate):
    """Host-annotated hashes, or — under `dhe_on_device: true` — the
    on-device SipHash of the shipped id halves (computed inside jit)."""
    dhe = batch.get(field + "_dhe")
    if dhe is None and field + "_dhe_lo" in batch:
        from oovrec_tpu.ops.siphash_device import dhe_codes_device

        dhe = dhe_codes_device(
            batch[field + "_dhe_lo"], batch[field + "_dhe_hi"],
            estate["dhe_key_parts"],
        )
    return dhe


def batch_weight(batch: Batch):
    return batch.get("weight")


MODEL_REGISTRY: Dict[str, Any] = {}


def register_model(cls):
    MODEL_REGISTRY[cls.__name__] = cls
    return cls
