"""General recommenders, third batch.

References: `general_recommender/fism.py`, `nais.py`, `enmf.py`,
`line.py`, `convncf.py`, `slimelastic.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.general.more import MultiVAE
from oovrec_tpu.models.init import normal_init, xavier_normal
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.utils.enums import InputType, ModelType


class _HistModel(GeneralRecommender):
    """Shared: padded per-user history in estate ('hist_items'/'hist_len')."""

    @staticmethod
    def build_estate(train_split, max_len: int = 200) -> dict:
        per_user = train_split.used_ids_per_user()
        H = min(max((len(p) for p in per_user), default=1) or 1, max_len)
        n = train_split.user_num
        hist = np.zeros((n, H), np.int64)
        lens = np.zeros(n, np.int64)
        for u, items in enumerate(per_user):
            items = np.asarray(items)[:H]
            hist[u, : len(items)] = items
            lens[u] = len(items)
        return {"hist_items": hist, "hist_len": lens}


@register_model
class FISM(_HistModel):
    """FISM (`fism.py`): item-based — user repr = α-normalized sum of
    history item source-embeddings (target excluded); BCE-with-logits."""

    input_type = InputType.POINTWISE
    alpha: float = 0.0
    reg_weights: Tuple[float, float] = (2e-2, 2e-2)

    def setup(self):
        init = normal_init(0.01)
        self.item_src = nn.Embed(self.n_items, self.embedding_size,
                                 embedding_init=init)
        self.item_dst = nn.Embed(self.n_items, self.embedding_size,
                                 embedding_init=init)
        self.user_bias = self.param(
            "user_bias", nn.initializers.zeros, (self.n_users,)
        )
        self.item_bias = self.param(
            "item_bias", nn.initializers.zeros, (self.n_items,)
        )

    def _score(self, users, items, estate):
        hist = estate["hist_items"][users]           # (B, H)
        lens = estate["hist_len"][users]
        mask = (jnp.arange(hist.shape[1])[None, :] < lens[:, None])
        # exclude the target item from its own history
        mask = mask & (hist != items[:, None])
        cnt = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        src = self.item_src(hist) * mask[:, :, None]
        user_repr = jnp.sum(src, axis=1) / (cnt[:, None] ** self.alpha)
        dst = self.item_dst(items)
        return (
            jnp.sum(user_repr * dst, axis=1)
            + self.user_bias[users]
            + self.item_bias[items]
        )

    def calculate_loss(self, batch: Batch, estate=None):
        out = self._score(batch[self.uid_field], batch[self.iid_field], estate)
        from oovrec_tpu.models.losses import bce_with_logits

        return bce_with_logits(out, batch[self.label_field], batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(
            self._score(batch[self.uid_field], batch[self.iid_field], estate)
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        hist = estate["hist_items"][users]
        lens = estate["hist_len"][users]
        mask = (jnp.arange(hist.shape[1])[None, :] < lens[:, None])
        cnt = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
        src = self.item_src(hist) * mask[:, :, None]
        user_repr = jnp.sum(src, axis=1) / (cnt[:, None] ** self.alpha)
        return (
            user_repr @ self.item_dst.embedding.T
            + self.user_bias[users][:, None]
            + self.item_bias[None, :]
        )


@register_model
class NAIS(FISM):
    """NAIS (`nais.py`): FISM with attention over the history instead of
    uniform pooling (product attention variant)."""

    weight_size: int = 64
    beta: float = 0.5

    def setup(self):
        super().setup()
        self.att_w = nn.Dense(self.weight_size, kernel_init=xavier_normal)
        self.att_h = self.param(
            "att_h", xavier_normal, (self.weight_size, 1)
        )

    def _score(self, users, items, estate):
        hist = estate["hist_items"][users]
        lens = estate["hist_len"][users]
        mask = (jnp.arange(hist.shape[1])[None, :] < lens[:, None])
        mask = mask & (hist != items[:, None])
        src = self.item_src(hist)                 # (B, H, D)
        dst = self.item_dst(items)                # (B, D)
        prod = src * dst[:, None, :]
        logits = (nn.relu(self.att_w(prod)) @ self.att_h).squeeze(-1)
        e = jnp.where(mask, jnp.exp(logits), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=1), 1e-12) ** self.beta
        att = e / denom[:, None]
        user_repr = jnp.sum(att[:, :, None] * src, axis=1)
        return (
            jnp.sum(user_repr * dst, axis=1)
            + self.user_bias[users]
            + self.item_bias[items]
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        items = jnp.arange(self.n_items)

        def per_item(i):
            return self._score(
                users, jnp.broadcast_to(i, users.shape), estate
            )

        return jax.vmap(per_item, out_axes=1)(items)


@register_model
class ENMF(_HistModel):
    """ENMF (`enmf.py`): efficient whole-corpus non-sampling loss — the
    negative part collapses to an O(D²) term over embedding Grams."""

    input_type = InputType.POINTWISE
    train_on_users = True
    dropout_prob: float = 0.7
    negative_weight: float = 0.5

    def setup(self):
        init = normal_init(0.01)
        self.user_embedding = nn.Embed(self.n_users, self.embedding_size,
                                       embedding_init=init)
        self.item_embedding = nn.Embed(self.n_items, self.embedding_size,
                                       embedding_init=init)
        self.h = self.param("h", nn.initializers.constant(0.01),
                            (self.embedding_size, 1))
        self.drop = nn.Dropout(self.dropout_prob)

    def calculate_loss(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        w = batch.get("weight")
        u = self.drop(self.user_embedding(users), deterministic=False)
        hist = estate["hist_items"][users]
        lens = estate["hist_len"][users]
        mask = (jnp.arange(hist.shape[1])[None, :] < lens[:, None]).astype(
            jnp.float32
        )
        ie = self.item_embedding(hist)            # (B, H, D)
        pos_score = ((u[:, None, :] * ie) @ self.h).squeeze(-1)  # (B, H)
        pos_part = jnp.sum(
            mask * (
                (1 - self.negative_weight) * pos_score**2 - 2 * pos_score
            ),
            axis=1,
        )
        # whole-corpus negative part via Gram matrices
        all_i = self.item_embedding.embedding
        gram_i = all_i.T @ all_i                   # (D, D)
        hh = self.h @ self.h.T                     # (D, D)
        neg_part = self.negative_weight * jnp.einsum(
            "bd,de,be->b", u, gram_i * hh, u
        )
        loss = pos_part + neg_part
        if w is None:
            return jnp.mean(loss)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        i = self.item_embedding(batch[self.iid_field])
        return ((u * i) @ self.h).squeeze(-1)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        scored = (u[:, None, :] * self.item_embedding.embedding[None]) @ self.h
        return scored.squeeze(-1)


@register_model
class LINE(GeneralRecommender):
    """LINE (`line.py`): first+second-order proximity embeddings over the
    bipartite graph with negative sampling."""

    input_type = InputType.PAIRWISE
    order: int = 2

    def setup(self):
        init = normal_init(0.01)
        self.user_embedding = nn.Embed(self.n_users, self.embedding_size,
                                       embedding_init=init)
        self.item_embedding = nn.Embed(self.n_items, self.embedding_size,
                                       embedding_init=init)
        if self.order == 2:
            self.user_ctx = nn.Embed(self.n_users, self.embedding_size,
                                     embedding_init=init)
            self.item_ctx = nn.Embed(self.n_items, self.embedding_size,
                                     embedding_init=init)

    def calculate_loss(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        w = batch.get("weight")

        def ns_loss(p, n):
            pos_s = jnp.sum(u * p, axis=1)
            neg_s = jnp.sum(u * n, axis=1)
            loss = -jax.nn.log_sigmoid(pos_s) - jax.nn.log_sigmoid(-neg_s)
            if w is None:
                return jnp.mean(loss)
            return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)

        # first-order proximity (the reference alternates orders per batch;
        # summing trains both tables each step — same objective family)
        total = ns_loss(self.item_embedding(pos), self.item_embedding(neg))
        if self.order == 2:
            total = total + ns_loss(self.item_ctx(pos), self.item_ctx(neg))
        return total

    def predict(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        i = self.item_embedding(batch[self.iid_field])
        return jnp.sum(u * i, axis=1)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        return u @ self.item_embedding.embedding.T


@register_model
class ConvNCF(GeneralRecommender):
    """ConvNCF (`convncf.py`): outer-product interaction map → CNN stack →
    scalar score; BPR loss."""

    input_type = InputType.PAIRWISE
    cnn_channels: Tuple[int, ...] = (32, 32)
    reg_weight: float = 0.0

    def setup(self):
        self.user_embedding = nn.Embed(self.n_users, self.embedding_size,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, self.embedding_size,
                                       embedding_init=xavier_normal)
        self.convs = [
            nn.Conv(c, kernel_size=(2, 2), strides=(2, 2), name=f"conv_{i}")
            for i, c in enumerate(self.cnn_channels)
        ]
        self.out = nn.Dense(1, kernel_init=xavier_normal)

    def _score(self, users, items):
        u = self.user_embedding(users)
        i = self.item_embedding(items)
        x = (u[:, :, None] * i[:, None, :])[..., None]  # (B, D, D, 1)
        for conv in self.convs:
            x = nn.relu(conv(x))
        return self.out(x.reshape(x.shape[0], -1)).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bpr_loss(
            self._score(batch[self.uid_field], batch[self.iid_field]),
            self._score(
                batch[self.uid_field], batch[self.neg_prefix + self.iid_field]
            ),
            batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return self._score(batch[self.uid_field], batch[self.iid_field])

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_item(i):
            return self._score(users, jnp.broadcast_to(i, users.shape))

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))


@register_model
class SLIMElastic(GeneralRecommender):
    """SLIMElastic (`slimelastic.py`): per-item ElasticNet over the
    interaction matrix, solved host-side by coordinate descent."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    alpha: float = 0.2
    l1_ratio: float = 0.02

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        return hist @ estate["slim_W"]

    @staticmethod
    def build_estate(train_split, alpha: float = 0.2,
                     l1_ratio: float = 0.02) -> dict:
        from sklearn.linear_model import ElasticNet

        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        X = np.zeros((train_split.user_num, train_split.item_num), np.float32)
        X[uid, iid] = 1.0
        n_items = X.shape[1]
        W = np.zeros((n_items, n_items), np.float32)
        model = ElasticNet(
            alpha=alpha, l1_ratio=l1_ratio, positive=True,
            fit_intercept=False, copy_X=False, max_iter=100, tol=1e-4,
        )
        import warnings

        for j in range(1, n_items):
            y = X[:, j].copy()
            X[:, j] = 0.0
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                model.fit(X, y)
            W[:, j] = model.coef_
            X[:, j] = y
        return {"slim_W": W, "user_hist_matrix": X}
