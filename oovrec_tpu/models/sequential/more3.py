"""Sequential recommenders, fourth batch.

References: `sequential_recommender/shan.py`, `npe.py`, `hrm.py`,
`core.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender, _log_softmax


@register_model
class SHAN(SequentialRecommender):
    """SHAN (`shan.py`): two-level attention — long-term set attention
    personalized by the user, then short-term window attention over
    [long-term repr ∥ recent items]."""

    short_item_length: int = 2

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.long_w = nn.Dense(D, kernel_init=xavier_normal)
        self.short_w = nn.Dense(D, kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        u = self.user_embedding(batch[self.uid_field])
        x = self.item_embedding(seq)
        B, L = seq.shape
        mask = jnp.arange(L)[None, :] < lengths[:, None]

        # long-term attention over the whole history
        ql = nn.relu(self.long_w(x))                      # (B, L, D)
        al = jnp.where(mask, jnp.sum(ql * u[:, None, :], axis=-1), -1e9)
        al = nn.softmax(al, axis=1)
        long_repr = jnp.sum(al[:, :, None] * x, axis=1)   # (B, D)

        # short-term: last K items + the long repr. The reference feeds
        # SHAN the inverse (right-aligned) sequence via the
        # inverse_itemseq transform; when that field is in the batch we
        # read the tail of it (most-recent-first), otherwise we derive
        # the same K items in-model by index — identical values at every
        # valid position, so metrics are transform-path invariant.
        K = self.short_item_length
        valid = (lengths[:, None] - 1 - jnp.arange(K)[None, :]) >= 0
        inv_field = "Inverse_" + self.iid_field + self.list_suffix
        if inv_field in batch and L >= K:
            recent_ids = batch[inv_field][:, -K:][:, ::-1]
        else:
            idx = jnp.clip(
                lengths[:, None] - 1 - jnp.arange(K)[None, :], 0, L - 1)
            recent_ids = jnp.take_along_axis(seq, idx, axis=1)
        recent = self.item_embedding(recent_ids)
        cat = jnp.concatenate([long_repr[:, None, :], recent], axis=1)
        cmask = jnp.concatenate(
            [jnp.ones((B, 1), bool), valid], axis=1
        )
        qs = nn.relu(self.short_w(cat))
        as_ = jnp.where(cmask, jnp.sum(qs * u[:, None, :], axis=-1), -1e9)
        as_ = nn.softmax(as_, axis=1)
        return jnp.sum(as_[:, :, None] * cat, axis=1)


@register_model
class NPE(SequentialRecommender):
    """NPE (`npe.py`): user pref + ReLU(history-sum) dual embeddings
    against ReLU item context embeddings."""

    dropout_prob: float = 0.3

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.item_ctx = nn.Embed(self.n_items, D,
                                 embedding_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        u = nn.relu(self.user_embedding(batch[self.uid_field]))
        hist = nn.relu(
            jnp.sum(self.item_embedding(seq) * mask[:, :, None], axis=1)
        )
        out = self.drop(u + hist, deterministic=not train)
        return out

    def full_sort_scores(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        return out @ nn.relu(self.item_ctx.embedding).T

    def predict(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        return jnp.sum(
            out * nn.relu(self.item_ctx(batch[self.iid_field])), axis=1
        )

    def calculate_loss(self, batch, estate=None):
        out = self.seq_output(batch, estate, train=True)
        logits = out @ nn.relu(self.item_ctx.embedding).T
        pos = batch[self.iid_field]
        w = batch.get("weight")
        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


@register_model
class HRM(SequentialRecommender):
    """HRM (`hrm.py`): hierarchical avg/max pooling of (user, last-window)
    representations."""

    high_order: int = 2
    pooling_type_layer_1: str = "max"
    pooling_type_layer_2: str = "max"
    dropout_prob: float = 0.2

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.drop = nn.Dropout(self.dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        K = self.high_order
        idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(K)[None, :], 0, L - 1)
        valid = ((lengths[:, None] - 1 - jnp.arange(K)[None, :]) >= 0)
        win = self.item_embedding(jnp.take_along_axis(seq, idx, axis=1))
        win = self.drop(win, deterministic=not train)
        vf = valid.astype(jnp.float32)[:, :, None]
        if self.pooling_type_layer_1 == "avg":
            l1 = jnp.sum(win * vf, axis=1) / jnp.maximum(
                jnp.sum(vf, axis=1), 1.0
            )
        else:
            l1 = jnp.max(win - (1 - vf) * 1e9, axis=1)
        u = self.user_embedding(batch[self.uid_field])
        both = jnp.stack([u, l1], axis=1)
        if self.pooling_type_layer_2 == "avg":
            return jnp.mean(both, axis=1)
        return jnp.max(both, axis=1)


@register_model
class CORE(SequentialRecommender):
    """CORE (`core.py`): representation-consistent encoder — the session
    repr is a weighted sum of item embeddings (mean or transformer
    weights), scored against L2-normalized item embeddings with a
    temperature."""

    dnn_type: str = "ave"
    temperature: float = 0.07
    item_dropout: float = 0.2

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.w_att = nn.Dense(1, kernel_init=xavier_normal)
        self.item_drop = nn.Dropout(self.item_dropout)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = jnp.arange(L)[None, :] < lengths[:, None]
        x = self.item_embedding(seq)
        if self.dnn_type == "trm":
            logits = jnp.where(mask, self.w_att(x).squeeze(-1), -1e9)
            alpha = nn.softmax(logits, axis=1)
        else:
            alpha = mask.astype(jnp.float32)
            alpha = alpha / jnp.maximum(
                jnp.sum(alpha, axis=1, keepdims=True), 1.0
            )
        out = jnp.sum(alpha[:, :, None] * x, axis=1)
        # eps-inside-sqrt normalization: norm() at exactly 0 (padded rows)
        # has a NaN gradient that would poison the whole batch via 0*nan
        norm = jnp.sqrt(jnp.sum(out**2, axis=-1, keepdims=True) + 1e-12)
        return out / norm

    def _item_norm(self, train: bool = False):
        e = self.item_embedding.embedding
        norm = jnp.sqrt(jnp.sum(e**2, axis=-1, keepdims=True) + 1e-12)
        return e / norm

    def calculate_loss(self, batch, estate=None):
        out = self.seq_output(batch, estate, train=True)
        logits = (out @ self._item_norm(True).T) / self.temperature
        pos = batch[self.iid_field]
        w = batch.get("weight")
        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def full_sort_scores(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        return (out @ self._item_norm().T) / self.temperature

    def predict(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        i = self._item_norm()[batch[self.iid_field]]
        return jnp.sum(out * i, axis=1) / self.temperature
