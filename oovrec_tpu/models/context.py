"""Context-aware (CTR) recommender base: packed field embeddings.

Equivalent of `ContextRecommender` / `InductiveContextRecommender`
(`recbole/model/abstract_recommender.py:310-842`) and the embedding layers
(`FMEmbedding` `layers.py:130`, `FLEmbedding` `layers.py:156`,
`FMFirstOrderLinear` `layers.py:1351`, `InductiveFMFirstOrderLinear`
`layers.py:1617`).

Layout (identical to the reference):
  * all token fields share ONE offset-packed table (sum(dims), D);
    token field order starts [user_id, item_id, ...] — the OOV scatter
    positions 0/1 depend on it (`abstract_recommender.py:691-692`);
  * numerical float fields embed as value × table[bucket + offset]
    ((value, bucket) pairs from discretization);
  * token_seq fields each get their own table, mean/max/sum-pooled;
  * field embedding order in the concat output: [token_seq ∥ token] for
    sparse, float for dense (`embed_input_fields` `:638-713`);
  * a first-order twin of the whole structure with output dim 1 + bias.

Inductive routing: the user/item cells of the packed lookup are replaced
branchlessly with OOV-routed embeddings (bucket tables or embedder) —
the reference's zero-then-overwrite (`abstract_recommender.py:794-842`)
without dynamic shapes. The first-order twin routes through its OWN dim-1
bucket tables / embedder MLP sharing the same feature matrices
(`abstract_recommender.py:748-760`, `layers.py:1626-1693`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.inductive.routing import route
from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.models.base import dhe_hashes_for, Batch, EmbedderMLP, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.utils.enums import FeatureSource, FeatureType, InputType, ModelType

# token columns a corpus may legitimately lack (PAD-filled when absent):
# the fork's is_new flag column exists only on the original benchmark files
OPTIONAL_TOKEN_COLUMNS = frozenset({"is_new"})


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of the feature fields (hashable for linen)."""

    token_names: Tuple[str, ...] = ()
    token_dims: Tuple[int, ...] = ()
    float_names: Tuple[str, ...] = ()
    float_dims: Tuple[int, ...] = ()
    token_seq_names: Tuple[str, ...] = ()
    token_seq_dims: Tuple[int, ...] = ()
    float_seq_names: Tuple[str, ...] = ()
    float_seq_dims: Tuple[int, ...] = ()
    # indices (into token_names) of user-side vs item-side fields — used by
    # double-tower models (the reference's FeatureSource split)
    user_token_idx: Tuple[int, ...] = (0,)
    item_token_idx: Tuple[int, ...] = (1,)

    @property
    def num_feature_field(self) -> int:
        return (
            len(self.token_names)
            + len(self.float_names)
            + len(self.token_seq_names)
            + len(self.float_seq_names)
        )

    @property
    def token_offsets(self) -> np.ndarray:
        return np.array((0, *np.cumsum(self.token_dims)[:-1]), dtype=np.int32)

    @property
    def float_offsets(self) -> np.ndarray:
        return np.array((0, *np.cumsum(self.float_dims)[:-1]), dtype=np.int32)


def field_spec_from_dataset(dataset, config) -> FieldSpec:
    """Mirror the reference's field scan (`abstract_recommender.py:378-425`)."""
    numerical = set(config["numerical_features"] or [])
    label = config["LABEL_FIELD"]
    sources = {
        FeatureSource.INTERACTION,
        FeatureSource.USER,
        FeatureSource.USER_ID,
        FeatureSource.ITEM,
        FeatureSource.ITEM_ID,
    }
    tn, td, fn, fd, sn, sd, qn, qd = [], [], [], [], [], [], [], []
    # field order: user_id and item_id first (the reference's field_names
    # come from field2source insertion order where inter fields lead; its
    # assert demands token[0]=user_id, token[1]=item_id)
    ordered = [config["USER_ID_FIELD"], config["ITEM_ID_FIELD"]] + [
        f
        for f in dataset.field2type
        if f not in (config["USER_ID_FIELD"], config["ITEM_ID_FIELD"])
    ]
    for f in ordered:
        if f == label or dataset.field2source.get(f) not in sources:
            continue
        t = dataset.field2type[f]
        if t == FeatureType.TOKEN:
            tn.append(f)
            td.append(dataset.num(f))
        elif t == FeatureType.TOKEN_SEQ:
            sn.append(f)
            sd.append(dataset.num(f))
        elif t == FeatureType.FLOAT and f in numerical:
            fn.append(f)
            fd.append(dataset.num(f))
        elif t == FeatureType.FLOAT_SEQ and f in numerical:
            qn.append(f)
            qd.append(dataset.num(f))
    from oovrec_tpu.utils.enums import FeatureSource as FS

    uidx, iidx = [], []
    for i, f in enumerate(tn):
        src = dataset.field2source.get(f)
        if src in (FS.USER, FS.USER_ID):
            uidx.append(i)
        elif src in (FS.ITEM, FS.ITEM_ID):
            iidx.append(i)
    if not uidx:
        uidx = [0]
    if not iidx:
        iidx = [1] if len(tn) > 1 else [0]
    return FieldSpec(
        tuple(tn), tuple(td), tuple(fn), tuple(fd),
        tuple(sn), tuple(sd), tuple(qn), tuple(qd),
        tuple(uidx), tuple(iidx),
    )


class _FieldEmbedding(nn.Module):
    """The packed token/float/seq embedding block at a given output dim —
    used at `embedding_size` for the towers and at dim 1 for the
    first-order linear twin."""

    fields: FieldSpec
    dim: int
    spec: Optional[InductiveSpec] = None
    uid_field: str = "user_id"
    iid_field: str = "item_id"

    def setup(self):
        f = self.fields
        if f.token_dims:
            self.token_table = nn.Embed(
                int(sum(f.token_dims)), self.dim,
                embedding_init=xavier_normal, name="token_embedding_table",
            )
        if f.float_dims:
            self.float_table = nn.Embed(
                int(sum(f.float_dims)), self.dim,
                embedding_init=xavier_normal, name="float_embedding_table",
            )
        self.token_seq_tables = [
            nn.Embed(d, self.dim, embedding_init=xavier_normal,
                     name=f"token_seq_table_{n}")
            for n, d in zip(f.token_seq_names, f.token_seq_dims)
        ]
        self.float_seq_tables = [
            nn.Embed(d, self.dim, embedding_init=xavier_normal,
                     name=f"float_seq_table_{n}")
            for n, d in zip(f.float_seq_names, f.float_seq_dims)
        ]
        if self.spec is not None and self.spec.active:
            if self.spec.needs_buckets:
                self.user_oov_buckets = nn.Embed(
                    self.spec.n_user_buckets, self.dim,
                    embedding_init=xavier_normal, name="user_oov_buckets",
                )
                self.item_oov_buckets = nn.Embed(
                    self.spec.n_item_buckets, self.dim,
                    embedding_init=xavier_normal, name="item_oov_buckets",
                )
            if self.spec.trainable_embedder:
                self.user_oov_mlp = EmbedderMLP(
                    self.spec.dhe_layer_size, self.dim, name="user_oov_mlp"
                )
                self.item_oov_mlp = EmbedderMLP(
                    self.spec.dhe_layer_size, self.dim, name="item_oov_mlp"
                )

    # -- token fields with OOV routing on cells 0/1 ------------------------

    def embed_token_fields(self, batch: Batch, estate) -> Optional[jnp.ndarray]:
        f = self.fields
        if not f.token_names:
            return None
        offsets = jnp.asarray(f.token_offsets)
        # only KNOWN-optional columns may fall back to [PAD]=0: the _ind
        # benchmark files carry no is_new column while the trained model
        # (rebuilt on the original dataset's fields) still embeds it; any
        # other absent column is a data-pipeline bug and must raise
        ref_col = batch[f.token_names[0]]
        missing = [
            n for n in f.token_names
            if n not in batch and n not in OPTIONAL_TOKEN_COLUMNS
        ]
        if missing:
            raise KeyError(
                f"token feature column(s) {missing} absent from the batch; "
                f"only {sorted(OPTIONAL_TOKEN_COLUMNS)} may be PAD-filled"
            )
        ids = jnp.stack(
            [batch[n] if n in batch else jnp.zeros_like(ref_col)
             for n in f.token_names],
            axis=1,
        )  # (B, F)
        n_vocab = jnp.asarray(np.array(f.token_dims, np.int32))
        safe = jnp.minimum(ids, n_vocab[None, :] - 1)
        # packed_gather: field-split backward — small-vocab fields route
        # their grads through a one-hot matmul instead of contributing
        # rows to XLA's serialized (70 ns/row) scatter-add, which was the
        # CTR step's largest single cost (EXPERIMENTS round 4)
        from oovrec_tpu.ops.embed_grad import packed_gather

        emb = packed_gather(
            self.token_table.embedding, safe + offsets[None, :],
            f.token_dims, f.token_offsets,
        )  # (B, F, dim)

        spec = self.spec
        if spec is not None and spec.active:
            for cell, side, field in (
                (0, "user", self.uid_field),
                (1, "item", self.iid_field),
            ):
                iv_table = self.token_table.embedding[
                    f.token_offsets[cell] : f.token_offsets[cell] + f.token_dims[cell]
                ]
                routed = route(
                    spec, side,
                    batch[field],
                    batch.get(field + "_oov"),
                    batch.get(field + "_bucket"),
                    iv_table,
                    (
                        (self.user_oov_buckets if side == "user" else self.item_oov_buckets).embedding
                        if spec.needs_buckets else None
                    ),
                    estate,
                    mlp_apply=(
                        (self.user_oov_mlp if side == "user" else self.item_oov_mlp)
                        if spec.trainable_embedder else None
                    ),
                    dhe_hashes=dhe_hashes_for(batch, field, estate),
                )
                emb = emb.at[:, cell, :].set(routed)
        return emb

    def embed_float_fields(self, batch: Batch) -> Optional[jnp.ndarray]:
        f = self.fields
        if not f.float_names:
            return None
        offsets = jnp.asarray(f.float_offsets)
        values = jnp.stack(
            [batch[n].astype(jnp.float32) for n in f.float_names], axis=1
        )  # (B, F)
        buckets = jnp.stack(
            [
                batch.get(n + "__bucket", jnp.ones_like(batch[n], jnp.int32))
                for n in f.float_names
            ],
            axis=1,
        ).astype(jnp.int32)
        from oovrec_tpu.ops.embed_grad import gather_rows

        emb = gather_rows(
            self.float_table.embedding, buckets + offsets[None, :]
        )
        return values[..., None] * emb  # (B, F, dim)

    def embed_token_seq_fields(self, batch: Batch, mode="mean"):
        f = self.fields
        if not f.token_seq_names:
            return None
        outs = []
        for name, table in zip(f.token_seq_names, self.token_seq_tables):
            seq = batch[name]  # (B, L)
            mask = (seq != 0).astype(jnp.float32)
            emb = table(seq)  # (B, L, dim)
            m = mask[..., None]
            if mode == "max":
                out = jnp.max(emb - (1 - m) * 1e9, axis=1)
            elif mode == "sum":
                out = jnp.sum(emb * m, axis=1)
            else:
                out = jnp.sum(emb * m, axis=1) / (
                    jnp.sum(mask, axis=1, keepdims=True) + 1e-8
                )
            outs.append(out[:, None, :])
        return jnp.concatenate(outs, axis=1)  # (B, F_seq, dim)

    def embed_float_seq_fields(self, batch: Batch, mode="mean"):
        f = self.fields
        if not f.float_seq_names:
            return None
        outs = []
        for name, table in zip(f.float_seq_names, self.float_seq_tables):
            idx = batch.get(name + "__bucket", batch[name]).astype(jnp.int32)
            base = batch[name].astype(jnp.float32)
            mask = (idx != 0).astype(jnp.float32)
            emb = base[..., None] * table(idx)
            m = mask[..., None]
            if mode == "max":
                out = jnp.max(emb - (1 - m) * 1e9, axis=1)
            elif mode == "sum":
                out = jnp.sum(emb * m, axis=1)
            else:
                out = jnp.sum(emb * m, axis=1) / (
                    jnp.sum(mask, axis=1, keepdims=True) + 1e-8
                )
            outs.append(out[:, None, :])
        return jnp.concatenate(outs, axis=1)

    def __call__(self, batch: Batch, estate=None):
        """→ (sparse (B, F_sparse, dim) | None, dense (B, F_dense, dim) | None),
        sparse order [token_seq ∥ token], dense order [float_seq ∥ float]
        (`embed_input_fields` `abstract_recommender.py:638-713`)."""
        token = self.embed_token_fields(batch, estate or {})
        token_seq = self.embed_token_seq_fields(batch)
        float_e = self.embed_float_fields(batch)
        float_seq = self.embed_float_seq_fields(batch)
        sparse = _cat([token_seq, token])
        dense = _cat([float_seq, float_e])
        return sparse, dense


def _cat(parts):
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


class FirstOrderLinear(nn.Module):
    """Σ field dim-1 embeddings + bias (`FMFirstOrderLinear`,
    `layers.py:1351-1615`); inductive twin routes user/item through its own
    dim-1 OOV structures (`InductiveFMFirstOrderLinear`, `layers.py:1617`)."""

    fields: FieldSpec
    spec: Optional[InductiveSpec] = None
    uid_field: str = "user_id"
    iid_field: str = "item_id"

    def setup(self):
        self.embedder = _FieldEmbedding(
            self.fields, 1, spec=self.spec,
            uid_field=self.uid_field, iid_field=self.iid_field,
            name="fo",
        )
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def __call__(self, batch: Batch, estate=None):
        sparse, dense = self.embedder(batch, estate)
        total = 0.0
        if sparse is not None:
            total = total + jnp.sum(sparse, axis=(1, 2))
        if dense is not None:
            total = total + jnp.sum(dense, axis=(1, 2))
        return total[:, None] + self.bias  # (B, 1)


class ContextRecommender(nn.Module):
    """Base for CTR towers: packed field embeddings + first-order linear."""

    model_type = ModelType.CONTEXT
    input_type = InputType.POINTWISE

    fields: FieldSpec = FieldSpec()
    embedding_size: int = 10
    spec: Optional[InductiveSpec] = None
    uid_field: str = "user_id"
    iid_field: str = "item_id"
    label_field: str = "label"
    neg_prefix: str = "neg_"

    # so the OOV freeze filter / trainer can treat CTR models uniformly
    @property
    def n_users(self):
        return self.fields.token_dims[0]

    @property
    def n_items(self):
        return self.fields.token_dims[1]

    def _setup_context(self):
        self.field_embedding = _FieldEmbedding(
            self.fields, self.embedding_size, spec=self.spec,
            uid_field=self.uid_field, iid_field=self.iid_field,
            name="fields",
        )
        self.first_order_linear = FirstOrderLinear(
            self.fields, spec=self.spec,
            uid_field=self.uid_field, iid_field=self.iid_field,
            name="first_order_linear",
        )

    def concat_embed_input_fields(self, batch: Batch, estate=None):
        sparse, dense = self.field_embedding(batch, estate)
        parts = []
        if sparse is not None:
            parts.append(sparse)
        if dense is not None:
            parts.append(dense)
        return jnp.concatenate(parts, axis=1)  # (B, num_field, D)

    @property
    def in_feature_num(self) -> int:
        return self.fields.num_feature_field * self.embedding_size
