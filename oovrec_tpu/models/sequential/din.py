"""DIN / DIEN — behavior-sequence CTR models.

References: `context_aware_recommender/din.py`, `dien.py` (the reference
routes them through a SequentialDataset variant; here they are sequential
models trained pointwise with sampled negatives and evaluated with
VALUE or ranking metrics).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce_with_logits
from oovrec_tpu.models.sequential.base import SequentialRecommender
from oovrec_tpu.utils.enums import InputType


@register_model
class DIN(SequentialRecommender):
    """Deep Interest Network: attention of the TARGET item over the
    behavior sequence pools user interest; MLP scores the click."""

    input_type = InputType.POINTWISE
    loss_type: str = "BCE"
    mlp_hidden_size: Tuple[int, ...] = (256, 256, 256)
    att_hidden: Tuple[int, ...] = (80, 40)
    dropout_prob: float = 0.0

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        att = []
        for i, h in enumerate(self.att_hidden):
            att.append(nn.Dense(h, kernel_init=xavier_normal, name=f"att_{i}"))
        self.att_layers = att
        self.att_out = nn.Dense(1, kernel_init=xavier_normal)
        self.mlp_layers = MLPLayers(
            (3 * self.embedding_size,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob, activation="sigmoid",
        )
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def _behavior_repr(self, seq_e):
        """Hook: DIEN replaces raw behavior embeddings with GRU states."""
        return seq_e

    def _attention_pool(self, seq_e, target_e, mask):
        """DIN attention: MLP over [h, t, h−t, h⊙t] → weights (no softmax
        normalization in the original — masked weights applied directly)."""
        t = jnp.broadcast_to(target_e[:, None, :], seq_e.shape)
        x = jnp.concatenate([seq_e, t, seq_e - t, seq_e * t], axis=-1)
        for l in self.att_layers:
            x = nn.sigmoid(l(x))
        w = self.att_out(x).squeeze(-1)  # (B, L)
        w = jnp.where(mask, w, -1e9)
        w = nn.softmax(w, axis=1)
        return jnp.sum(w[:, :, None] * seq_e, axis=1)

    def forward(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        target = batch[self.iid_field]
        L = seq.shape[1]
        mask = jnp.arange(L)[None, :] < lengths[:, None]
        seq_e = self.item_embedding(seq)
        target_e = self.item_embedding(target)
        interest = self._attention_pool(seq_e, target_e, mask)
        u = self.user_embedding(batch[self.uid_field])
        x = jnp.concatenate([interest, target_e, u], axis=-1)
        h = self.mlp_layers(x, train=train)
        return self.predict_layer(h).squeeze(-1)

    def calculate_loss(self, batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))

    def full_sort_scores(self, batch, estate=None):
        """Score every item as a target (batched attention)."""
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        mask = jnp.arange(L)[None, :] < lengths[:, None]
        seq_e = self._behavior_repr(self.item_embedding(seq))
        u = self.user_embedding(batch[self.uid_field])

        def score_block(targets):
            te = self.item_embedding(targets)  # (T, D)

            def per_target(t_e):
                interest = self._attention_pool(
                    seq_e, jnp.broadcast_to(t_e, (B, t_e.shape[-1])), mask
                )
                x = jnp.concatenate(
                    [interest, jnp.broadcast_to(t_e, (B, t_e.shape[-1])), u],
                    axis=-1,
                )
                return self.predict_layer(self.mlp_layers(x)).squeeze(-1)

            return jax.vmap(per_target, out_axes=1)(te)

        return score_block(jnp.arange(self.n_items))


@register_model
class DIEN(DIN):
    """DIEN: GRU interest extraction before the DIN attention pooling,
    with the interest extractor's auxiliary loss (`dien.py` /
    `customized_dataset.py` DIENDataset): hidden state h_t must score the
    next clicked item above a random negative. The reference samples the
    negative sequence host-side (SeqSampler); here it is drawn on-device
    from the dropout rng with a collision bump."""

    alpha: float = 1.0  # auxiliary-loss weight (reference config 'alpha')

    def setup(self):
        super().setup()
        ScanGRU = nn.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        self.interest_gru = ScanGRU(features=self.embedding_size)

    def _behavior_repr(self, seq_e):
        return self._interest_states(seq_e)

    def _interest_states(self, seq_e):
        B = seq_e.shape[0]
        carry = self.interest_gru.initialize_carry(
            jax.random.key(0), (B, seq_e.shape[-1])
        )
        _, seq_h = self.interest_gru(carry, seq_e)
        return seq_h

    def forward(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        target = batch[self.iid_field]
        B, L = seq.shape
        mask = jnp.arange(L)[None, :] < lengths[:, None]
        seq_e = self.item_embedding(seq)
        seq_h = self._behavior_repr(seq_e)
        target_e = self.item_embedding(target)
        interest = self._attention_pool(seq_h, target_e, mask)
        u = self.user_embedding(batch[self.uid_field])
        x = jnp.concatenate([interest, target_e, u], axis=-1)
        h = self.mlp_layers(x, train=train)
        return self.predict_layer(h).squeeze(-1)

    def _aux_loss(self, batch):
        """BCE(h_t · e(seq_{t+1})) vs BCE(h_t · e(neg_{t+1}))."""
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        seq_e = self.item_embedding(seq)
        seq_h = self._interest_states(seq_e)
        # `dien_neg_sampling: presampled` ships a fixed-per-run negative
        # history column from the dataset build (DIENDataset semantics,
        # `ref:customized_dataset.py:38-70`); the default draws fresh
        # negatives per step on device (collision-bumped)
        presampled = batch.get(
            self.neg_prefix + self.iid_field + self.list_suffix
        )
        if presampled is not None:
            neg = presampled
        else:
            neg = jax.random.randint(
                self.make_rng("dropout"), seq.shape, 1, self.n_items
            )
            neg = jnp.where(neg == seq, neg % (self.n_items - 1) + 1, neg)
        h = seq_h[:, :-1, :]
        pos_s = jnp.sum(h * seq_e[:, 1:, :], axis=-1)
        neg_s = jnp.sum(h * self.item_embedding(neg)[:, 1:, :], axis=-1)
        # positions t where both t and t+1 are valid
        valid = (jnp.arange(L - 1)[None, :] + 1 < lengths[:, None])
        sp = nn.log_sigmoid(pos_s)
        sn = nn.log_sigmoid(-neg_s)
        per = -(sp + sn) * valid
        return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1.0)

    def calculate_loss(self, batch, estate=None):
        base = bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )
        return base + self.alpha * self._aux_loss(batch)
