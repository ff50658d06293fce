"""Sequential recommenders, third batch.

References: `sequential_recommender/hgn.py`, `fossil.py`, `transrec.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.models.sequential.base import SequentialRecommender
from oovrec_tpu.utils.enums import InputType


@register_model
class HGN(SequentialRecommender):
    """HGN (`hgn.py`): hierarchical feature/instance gating over the recent
    window + user embedding + item-item residual."""

    pool_type: str = "average"

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.w1 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)
        self.w2 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)
        self.b_g = self.param("b_g", nn.initializers.zeros, (D,))
        self.w3 = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.w4_kernel = self.param(
            "w4_kernel", xavier_normal, (D, self.max_seq_length)
        )

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        u = self.user_embedding(batch[self.uid_field])
        x = self.item_embedding(seq)                       # (B, L, D)
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        # feature gating
        fg = nn.sigmoid(self.w1(x) + self.w2(u)[:, None, :] + self.b_g)
        xf = x * fg
        # instance gating
        ig = nn.sigmoid(
            self.w3(xf).squeeze(-1) + (u @ self.w4_kernel)
        )                                                   # (B, L)
        ig = ig * mask
        xi = xf * ig[:, :, None]
        if self.pool_type == "max":
            pooled = jnp.max(xi - (1 - mask[:, :, None]) * 1e9, axis=1)
        else:
            pooled = jnp.sum(xi, axis=1) / jnp.maximum(
                jnp.sum(ig, axis=1, keepdims=True), 1e-12
            )
        # item-item residual: sum of raw item embeddings
        residual = jnp.sum(x * mask[:, :, None], axis=1)
        return u + pooled + residual


@register_model
class FOSSIL(SequentialRecommender):
    """FOSSIL (`fossil.py`): FISM-style similarity pooling + higher-order
    Markov term with learned per-user/global decay weights."""

    order_len: int = 3
    alpha: float = 0.6
    reg_weight: float = 0.0

    def setup(self):
        D = self.embedding_size
        self.item_src = nn.Embed(self.n_items, D, embedding_init=xavier_normal)
        self.item_dst = nn.Embed(self.n_items, D, embedding_init=xavier_normal)
        self.user_lambda = nn.Embed(self.n_users, self.order_len,
                                    embedding_init=nn.initializers.zeros)
        self.global_lambda = self.param(
            "global_lambda", nn.initializers.zeros, (self.order_len,)
        )

    def _repr(self, batch):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        src = self.item_src(seq) * mask[:, :, None]
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        sim_part = jnp.sum(src, axis=1) / (cnt**self.alpha)
        # last `order_len` items weighted by (user + global) lambdas
        lam = (
            self.user_lambda(batch[self.uid_field])
            + self.global_lambda[None, :]
        )                                                  # (B, K)
        K = self.order_len
        idx = jnp.clip(
            lengths[:, None] - 1 - jnp.arange(K)[None, :], 0, L - 1
        )                                                  # (B, K) recent-first
        valid = (lengths[:, None] - 1 - jnp.arange(K)[None, :]) >= 0
        recent = jnp.take_along_axis(seq, idx, axis=1)
        markov = jnp.sum(
            self.item_src(recent)
            * (lam * valid.astype(jnp.float32))[:, :, None],
            axis=1,
        )
        return sim_part + markov

    def seq_output(self, batch, estate=None, train: bool = False):
        return self._repr(batch)

    def full_sort_scores(self, batch, estate=None):
        return self._repr(batch) @ self.item_dst.embedding.T

    def predict(self, batch, estate=None):
        return jnp.sum(
            self._repr(batch) * self.item_dst(batch[self.iid_field]), axis=1
        )

    def calculate_loss(self, batch, estate=None):
        # item_embedding alias for the base CE path is item_dst
        out = self._repr(batch)
        pos = batch[self.iid_field]
        w = batch.get("weight")
        logits = out @ self.item_dst.embedding.T
        from oovrec_tpu.models.sequential.base import _log_softmax

        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


@register_model
class TransRec(SequentialRecommender):
    """TransRec (`transrec.py`): translation-based — user vector translates
    from the last item toward the next (‖last + t_u − next‖); BPR."""

    input_type = InputType.PAIRWISE
    loss_type: str = "BPR"

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.user_t = nn.Embed(self.n_users, D, embedding_init=xavier_normal)
        self.global_t = self.param("global_t", nn.initializers.zeros, (D,))
        self.item_bias = self.param(
            "item_bias", nn.initializers.zeros, (self.n_items,)
        )

    def _last_item(self, batch):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        idx = jnp.maximum(lengths - 1, 0)
        return jnp.take_along_axis(seq, idx[:, None], axis=1).squeeze(1)

    def _score(self, users, last, items):
        t = self.user_t(users) + self.global_t[None, :]
        src = self.item_embedding(last)
        dst = self.item_embedding(items)
        d = jnp.sum((src + t - dst) ** 2, axis=-1)
        return self.item_bias[items] - jnp.sqrt(jnp.maximum(d, 1e-12))

    def calculate_loss(self, batch, estate=None):
        users = batch[self.uid_field]
        last = self._last_item(batch)
        return bpr_loss(
            self._score(users, last, batch[self.iid_field]),
            self._score(users, last, batch[self.neg_prefix + self.iid_field]),
            batch.get("weight"),
        )

    def predict(self, batch, estate=None):
        return self._score(
            batch[self.uid_field], self._last_item(batch),
            batch[self.iid_field],
        )

    def full_sort_scores(self, batch, estate=None):
        users = batch[self.uid_field]
        last = self._last_item(batch)
        t = self.user_t(users) + self.global_t[None, :]
        src = self.item_embedding(last)
        query = src + t                                     # (B, D)
        dst = self.item_embedding.embedding                 # (N, D)
        d = (
            jnp.sum(query**2, axis=1)[:, None]
            + jnp.sum(dst**2, axis=1)[None, :]
            - 2 * query @ dst.T
        )
        return self.item_bias[None, :] - jnp.sqrt(jnp.maximum(d, 1e-12))