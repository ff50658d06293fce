"""General recommenders, second batch.

References: `general_recommender/multidae.py`, `cdae.py`, `dmf.py`,
`simplex.py`, `ngcf.py`, `sgl.py`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.general.more import MultiVAE
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class MultiDAE(GeneralRecommender):
    """Mult-DAE (`multidae.py`): the non-variational sibling of Mult-VAE."""

    input_type = InputType.POINTWISE
    train_on_users = True
    latent_dim: int = 64
    encoder_hidden: Tuple[int, ...] = (256,)
    dropout_prob: float = 0.5

    def setup(self):
        self.enc_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"enc_{i}")
            for i, h in enumerate(self.encoder_hidden)
        ]
        self.enc_out = nn.Dense(self.latent_dim, kernel_init=xavier_normal)
        self.dec_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"dec_{i}")
            for i, h in enumerate(reversed(self.encoder_hidden))
        ]
        self.dec_out = nn.Dense(self.n_items, kernel_init=xavier_normal)
        self.in_dropout = nn.Dropout(self.dropout_prob)

    def forward(self, hist, train: bool = False):
        h = hist / jnp.maximum(
            jnp.linalg.norm(hist, axis=-1, keepdims=True), 1e-12
        )
        h = self.in_dropout(h, deterministic=not train)
        for layer in self.enc_layers:
            h = nn.tanh(layer(h))
        h = nn.tanh(self.enc_out(h))
        for layer in self.dec_layers:
            h = nn.tanh(layer(h))
        return self.dec_out(h)

    def calculate_loss(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        w = batch.get("weight")
        logits = self.forward(hist, train=True)
        ce = -jnp.sum(jax.nn.log_softmax(logits, axis=-1) * hist, axis=1)
        if w is None:
            return jnp.mean(ce)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        hist = estate["user_hist_matrix"][batch[self.uid_field]]
        return self.forward(hist, train=False)

    build_estate = staticmethod(MultiVAE.build_estate)


@register_model
class CDAE(GeneralRecommender):
    """CDAE (`cdae.py`): denoising autoencoder over the interaction vector
    with a per-user embedding added to the hidden layer; BCE-with-logits."""

    input_type = InputType.POINTWISE
    train_on_users = True
    embedding_size: int = 64
    corruption_ratio: float = 0.5
    reg_weight_1: float = 0.0
    reg_weight_2: float = 0.01

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.encoder = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.decoder = nn.Dense(self.n_items, kernel_init=xavier_normal)
        self.drop = nn.Dropout(self.corruption_ratio)

    def forward(self, users, hist, train: bool = False):
        x = self.drop(hist, deterministic=not train)
        h = nn.sigmoid(self.encoder(x) + self.user_embedding(users))
        return self.decoder(h)

    def calculate_loss(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        hist = estate["user_hist_matrix"][users]
        w = batch.get("weight")
        logits = self.forward(users, hist, train=True)
        loss = jnp.maximum(logits, 0) - logits * hist + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        per_user = jnp.sum(loss, axis=1)
        reg = self.reg_weight_2 * (
            jnp.sum(self.encoder.variables["params"]["kernel"] ** 2)
            + jnp.sum(self.decoder.variables["params"]["kernel"] ** 2)
        )
        if w is None:
            return jnp.mean(per_user) + reg
        return jnp.sum(per_user * w) / jnp.maximum(jnp.sum(w), 1.0) + reg

    def predict(self, batch: Batch, estate=None):
        s = self.full_sort_scores(batch, estate)
        return s[jnp.arange(s.shape[0]), batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        hist = estate["user_hist_matrix"][users]
        return self.forward(users, hist, train=False)

    build_estate = staticmethod(MultiVAE.build_estate)


@register_model
class DMF(GeneralRecommender):
    """DMF (`dmf.py`): dual MLP towers over interaction-vector inputs,
    cosine matching score, BCE."""

    input_type = InputType.POINTWISE
    user_hidden: Tuple[int, ...] = (64,)
    item_hidden: Tuple[int, ...] = (64,)

    def setup(self):
        self.user_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"u_{i}")
            for i, h in enumerate(self.user_hidden)
        ]
        self.item_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"i_{i}")
            for i, h in enumerate(self.item_hidden)
        ]

    def _towers(self, users, items, estate):
        u = estate["user_hist_matrix"][users]
        i = estate["user_hist_matrix"].T[items]
        for l in self.user_layers:
            u = nn.relu(l(u))
        for l in self.item_layers:
            i = nn.relu(l(i))
        return u, i

    def _cos(self, u, i):
        nu = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-12)
        ni = jnp.maximum(jnp.linalg.norm(i, axis=-1), 1e-12)
        return jnp.sum(u * i, axis=-1) / (nu * ni)

    def calculate_loss(self, batch: Batch, estate=None):
        u, i = self._towers(
            batch[self.uid_field], batch[self.iid_field], estate
        )
        score = jnp.clip(self._cos(u, i), 1e-6, 1.0)
        label = batch[self.label_field]
        w = batch.get("weight")
        loss = -(label * jnp.log(score) + (1 - label) * jnp.log(1 - score + 1e-6))
        if w is None:
            return jnp.mean(loss)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        u, i = self._towers(
            batch[self.uid_field], batch[self.iid_field], estate
        )
        return self._cos(u, i)

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        u = estate["user_hist_matrix"][users]
        for l in self.user_layers:
            u = nn.relu(l(u))
        i = estate["user_hist_matrix"].T
        for l in self.item_layers:
            i = nn.relu(l(i))
        nu = jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        ni = jnp.maximum(jnp.linalg.norm(i, axis=-1, keepdims=True), 1e-12)
        return (u / nu) @ (i / ni).T

    build_estate = staticmethod(MultiVAE.build_estate)


@register_model
class SimpleX(GeneralRecommender):
    """SimpleX (`simplex.py`): cosine contrastive loss with margin over a
    user tower aggregated from the interaction history."""

    input_type = InputType.PAIRWISE
    margin: float = 0.9
    negative_weight: float = 10.0
    gamma: float = 0.5

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )

    def _user_vec(self, users, estate):
        ue = self.user_embedding(users)
        hist = estate["user_hist_matrix"][users]  # (B, n_items)
        agg = hist @ self.item_embedding.embedding
        cnt = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1.0)
        return self.gamma * ue + (1 - self.gamma) * agg / cnt

    @staticmethod
    def _cos(a, b):
        na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-12)
        nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-12)
        return jnp.sum(a * b, axis=-1) / (na * nb)

    def calculate_loss(self, batch: Batch, estate=None):
        u = self._user_vec(batch[self.uid_field], estate)
        pos = self.item_embedding(batch[self.iid_field])
        neg = self.item_embedding(batch[self.neg_prefix + self.iid_field])
        w = batch.get("weight")
        pos_loss = nn.relu(1 - self._cos(u, pos))
        neg_loss = nn.relu(self._cos(u, neg) - self.margin)
        loss = pos_loss + self.negative_weight * neg_loss
        if w is None:
            return jnp.mean(loss)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        u = self._user_vec(batch[self.uid_field], estate)
        i = self.item_embedding(batch[self.iid_field])
        return self._cos(u, i)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self._user_vec(batch[self.uid_field], estate)
        items = self.item_embedding.embedding
        nu = jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        ni = jnp.maximum(jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
        return (u / nu) @ (items / ni).T

    build_estate = staticmethod(MultiVAE.build_estate)


class _GraphRecommender(GeneralRecommender):
    """Shared segment-sum propagation plumbing (LightGCN-style edges)."""

    def _prop(self, e, estate, weight_fn=None):
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        n = self.n_users + self.n_items
        msg = e[src] * w
        if weight_fn is not None:
            msg = weight_fn(msg, e, src, dst)
        return jax.ops.segment_sum(msg, dst, num_segments=n)


@register_model
class NGCF(_GraphRecommender):
    """NGCF (`ngcf.py`): propagation with feature transforms
    (W1(Â e) + W2(Â e ⊙ e)), LeakyReLU, layer-concat; BPR + emb reg."""

    input_type = InputType.PAIRWISE
    hidden_size_list: Tuple[int, ...] = (64, 64, 64)
    node_dropout: float = 0.0
    message_dropout: float = 0.1
    reg_weight: float = 1e-5

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )
        self.gc_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"gc_{i}")
            for i, h in enumerate(self.hidden_size_list)
        ]
        self.bi_layers = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"bi_{i}")
            for i, h in enumerate(self.hidden_size_list)
        ]
        self.mdrop = nn.Dropout(self.message_dropout)

    def _embeddings(self, estate, train: bool = False):
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        outs = [e]
        for gc, bi in zip(self.gc_layers, self.bi_layers):
            side = self._prop(e, estate)
            summed = nn.leaky_relu(gc(side) + gc(e))
            bi_part = nn.leaky_relu(bi(side * e))
            e = summed + bi_part
            e = self.mdrop(e, deterministic=not train)
            e = e / jnp.maximum(
                jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12
            )
            outs.append(e)
        all_e = jnp.concatenate(outs, axis=1)
        return all_e[: self.n_users], all_e[self.n_users :]

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate, train=True)
        u = ue[batch[self.uid_field]]
        p = ie[batch[self.iid_field]]
        n = ie[batch[self.neg_prefix + self.iid_field]]
        mf = bpr_loss(
            jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1),
            batch.get("weight"),
        )
        reg = emb_loss(u, p, n)
        return mf + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate)
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self._embeddings(estate)
        return ue[batch[self.uid_field]] @ ie.T

    @staticmethod
    def build_estate(train_split) -> dict:
        from oovrec_tpu.models.general.lightgcn import LightGCN

        return LightGCN.build_estate(train_split)


@register_model
class SGL(_GraphRecommender):
    """SGL (`sgl.py`): LightGCN propagation + InfoNCE self-supervision over
    edge-dropout augmented views; BPR + ssl + reg."""

    input_type = InputType.PAIRWISE
    n_layers: int = 2
    ssl_tau: float = 0.5
    ssl_weight: float = 0.05
    drop_ratio: float = 0.1
    reg_weight: float = 1e-5

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )

    def _lightgcn(self, estate, edge_mask=None):
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        if edge_mask is not None:
            w = w * edge_mask[:, None]
        n = self.n_users + self.n_items
        acc, cur = e, e
        for _ in range(self.n_layers):
            cur = jax.ops.segment_sum(cur[src] * w, dst, num_segments=n)
            acc = acc + cur
        acc = acc / (self.n_layers + 1)
        return acc[: self.n_users], acc[self.n_users :]

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._lightgcn(estate)
        users = batch[self.uid_field]
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        w = batch.get("weight")
        u, p, ng = ue[users], ie[pos], ie[neg]
        mf = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * ng, axis=1), w)

        # two edge-dropout views
        k1 = self.make_rng("dropout")
        k2 = jax.random.fold_in(k1, 1)
        m1 = (jax.random.uniform(k1, estate["edge_src"].shape) > self.drop_ratio)
        m2 = (jax.random.uniform(k2, estate["edge_src"].shape) > self.drop_ratio)
        u1, i1 = self._lightgcn(estate, m1.astype(jnp.float32))
        u2, i2 = self._lightgcn(estate, m2.astype(jnp.float32))

        def info_nce(a, b, ids):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
            pos_s = jnp.sum(a[ids] * b[ids], axis=1) / self.ssl_tau
            all_s = (a[ids] @ b.T) / self.ssl_tau
            return jnp.mean(
                -pos_s + jax.nn.logsumexp(all_s, axis=1)
            )

        ssl = info_nce(u1, u2, users) + info_nce(i1, i2, pos)
        reg = emb_loss(
            self.user_embedding(users),
            self.item_embedding(pos),
            self.item_embedding(neg),
        )
        return mf + self.ssl_weight * ssl + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        ue, ie = self._lightgcn(estate)
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self._lightgcn(estate)
        return ue[batch[self.uid_field]] @ ie.T

    @staticmethod
    def build_estate(train_split) -> dict:
        from oovrec_tpu.models.general.lightgcn import LightGCN

        return LightGCN.build_estate(train_split)
