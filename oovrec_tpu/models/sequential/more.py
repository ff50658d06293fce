"""Additional sequential recommenders.

References: `sequential_recommender/narm.py`, `stamp.py`, `fpmc.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.models.sequential.base import SequentialRecommender
from oovrec_tpu.utils.enums import InputType


@register_model
class NARM(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    """NARM (`narm.py`): GRU encoder; global (last state) + local
    (attention over states) representations concatenated and projected."""

    hidden_size: int = 128
    dropout_probs: tuple = (0.25, 0.5)

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        ScanGRU = nn.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        self.gru = ScanGRU(features=self.hidden_size)
        self.a1 = nn.Dense(self.hidden_size, use_bias=False,
                           kernel_init=xavier_normal)
        self.a2 = nn.Dense(self.hidden_size, use_bias=False,
                           kernel_init=xavier_normal)
        self.v = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.b = nn.Dense(self.embedding_size, use_bias=False,
                          kernel_init=xavier_normal)
        self.emb_dropout = nn.Dropout(self.dropout_probs[0])
        self.ct_dropout = nn.Dropout(self.dropout_probs[1])

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        x = self.item_embedding(seq)
        x = self.emb_dropout(x, deterministic=not train)
        B, L = seq.shape
        carry = self.gru.initialize_carry(jax.random.key(0), (B, x.shape[-1]))
        _, states = self.gru(carry, x)  # (B, L, H)
        ht = self._gather_last(states, lengths)  # (B, H)
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        q = self.v(
            nn.sigmoid(self.a1(ht)[:, None, :] + self.a2(states))
        ).squeeze(-1)  # (B, L)
        alpha = q * mask
        c_local = jnp.sum(alpha[:, :, None] * states, axis=1)
        c = jnp.concatenate([ht, c_local], axis=1)
        c = self.ct_dropout(c, deterministic=not train)
        return self.b(c)


@register_model
class STAMP(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    """STAMP (`stamp.py`): attention over item embeddings with the last
    click as the short-term signal; trilinear composition."""

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        self.w1 = nn.Dense(self.embedding_size, use_bias=False,
                           kernel_init=xavier_normal)
        self.w2 = nn.Dense(self.embedding_size, use_bias=False,
                           kernel_init=xavier_normal)
        self.w3 = nn.Dense(self.embedding_size, use_bias=False,
                           kernel_init=xavier_normal)
        self.w0 = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.b_a = self.param(
            "b_a", nn.initializers.zeros, (self.embedding_size,)
        )
        self.mlp_a = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.mlp_b = nn.Dense(self.embedding_size, kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        x = self.item_embedding(seq)  # (B, L, D)
        B, L = seq.shape
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        last = self._gather_last(x, lengths)  # (B, D)
        ms = jnp.sum(x * mask[:, :, None], axis=1) / jnp.maximum(
            lengths[:, None].astype(jnp.float32), 1.0
        )
        # attention weights
        q = self.w0(
            nn.sigmoid(
                self.w1(x) + self.w2(last)[:, None, :]
                + self.w3(ms)[:, None, :] + self.b_a[None, None, :]
            )
        ).squeeze(-1)  # (B, L)
        a = q * mask
        ma = jnp.sum(a[:, :, None] * x, axis=1) + ms
        hs = nn.tanh(self.mlp_a(ma))
        ht = nn.tanh(self.mlp_b(last))
        return hs * ht


@register_model
class FPMC(SequentialRecommender):
    """FPMC (`fpmc.py`): MF (user·item) + factorized first-order Markov
    (last-item·item); BPR loss."""

    input_type = InputType.PAIRWISE
    loss_type: str = "BPR"

    def setup(self):
        D = self.embedding_size
        self.UI = nn.Embed(self.n_users, D, embedding_init=xavier_normal)
        self.IU = nn.Embed(self.n_items, D, embedding_init=xavier_normal)
        self.LI = nn.Embed(self.n_items, D, embedding_init=xavier_normal)
        self.IL = nn.Embed(self.n_items, D, embedding_init=xavier_normal)
        # alias for base-class CE path compatibility
        self.item_embedding = self.IU

    def _score(self, user, last_item, items):
        mf = jnp.sum(self.UI(user) * self.IU(items), axis=-1)
        fmc = jnp.sum(self.LI(last_item) * self.IL(items), axis=-1)
        return mf + fmc

    def _last_item(self, batch):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        idx = jnp.maximum(lengths - 1, 0)
        return jnp.take_along_axis(seq, idx[:, None], axis=1).squeeze(1)

    def calculate_loss(self, batch, estate=None):
        user = batch[self.uid_field]
        last = self._last_item(batch)
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        return bpr_loss(
            self._score(user, last, pos),
            self._score(user, last, neg),
            batch.get("weight"),
        )

    def predict(self, batch, estate=None):
        return self._score(
            batch[self.uid_field], self._last_item(batch),
            batch[self.iid_field],
        )

    def full_sort_scores(self, batch, estate=None):
        user = batch[self.uid_field]
        last = self._last_item(batch)
        mf = self.UI(user) @ self.IU.embedding.T
        fmc = self.LI(last) @ self.IL.embedding.T
        return mf + fmc
