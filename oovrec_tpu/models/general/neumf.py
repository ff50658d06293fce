"""NeuMF (reference `general_recommender/neumf.py`): GMF ⊕ MLP fusion with
pointwise BCE-with-logits."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import normal_init, xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce_with_logits
from oovrec_tpu.utils.enums import InputType


@register_model
class NeuMF(GeneralRecommender):
    input_type = InputType.POINTWISE
    mf_embedding_size: int = 64
    mlp_embedding_size: int = 64
    mlp_hidden_size: Tuple[int, ...] = (128, 64)
    dropout_prob: float = 0.1
    mf_train: bool = True
    mlp_train: bool = True

    def setup(self):
        init = normal_init(0.01)  # reference uses normal_(0, 0.01)
        self.user_mf_embedding = nn.Embed(
            self.n_users, self.mf_embedding_size, embedding_init=init
        )
        self.item_mf_embedding = nn.Embed(
            self.n_items, self.mf_embedding_size, embedding_init=init
        )
        self.user_mlp_embedding = nn.Embed(
            self.n_users, self.mlp_embedding_size, embedding_init=init
        )
        self.item_mlp_embedding = nn.Embed(
            self.n_items, self.mlp_embedding_size, embedding_init=init
        )
        self.mlp_layers = MLPLayers(
            (2 * self.mlp_embedding_size,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob,
        )
        pred_in = 0
        if self.mf_train:
            pred_in += self.mf_embedding_size
        if self.mlp_train:
            pred_in += self.mlp_hidden_size[-1]
        self.predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def forward(self, user, item, train: bool = False):
        parts = []
        if self.mf_train:
            parts.append(
                self.user_mf_embedding(user) * self.item_mf_embedding(item)
            )
        if self.mlp_train:
            x = jnp.concatenate(
                [self.user_mlp_embedding(user), self.item_mlp_embedding(item)],
                axis=-1,
            )
            parts.append(self.mlp_layers(x, train=train))
        return self.predict_layer(jnp.concatenate(parts, axis=-1)).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        out = self.forward(
            batch[self.uid_field], batch[self.iid_field], train=True
        )
        return bce_with_logits(out, batch[self.label_field], batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(
            self.forward(batch[self.uid_field], batch[self.iid_field])
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        B = users.shape[0]
        item_ids = jnp.arange(self.n_items)
        u = jnp.repeat(users, self.n_items)
        i = jnp.tile(item_ids, B)
        return self.forward(u, i).reshape(B, self.n_items)
