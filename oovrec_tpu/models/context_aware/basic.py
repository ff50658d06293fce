"""LR / FM / DeepFM — classic CTR baselines on the shared context base
(reference: `context_aware_recommender/lr.py`, `fm.py`, `deepfm.py`)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce, bce_with_logits


def fm_second_order(emb: jnp.ndarray) -> jnp.ndarray:
    """BaseFactorizationMachine, reduce_sum=True (`layers.py:184-237`):
    0.5 * Σ_d [(Σ_f e)² − Σ_f e²]."""
    sum_sq = jnp.sum(emb, axis=1) ** 2
    sq_sum = jnp.sum(emb**2, axis=1)
    return 0.5 * jnp.sum(sum_sq - sq_sum, axis=1, keepdims=True)


@register_model
class LR(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    def setup(self):
        self._setup_context()

    def forward(self, batch: Batch, estate=None, train: bool = False):
        return nn.sigmoid(self.first_order_linear(batch, estate)).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce(
            self.forward(batch, estate, train=True),
            batch[self.label_field],
            batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return self.forward(batch, estate)


@register_model
class FM(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    def setup(self):
        self._setup_context()

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        y = self.first_order_linear(batch, estate) + fm_second_order(emb)
        return nn.sigmoid(y).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce(
            self.forward(batch, estate, train=True),
            batch[self.label_field],
            batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return self.forward(batch, estate)


@register_model
class DeepFM(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    mlp_hidden_size: Tuple[int, ...] = (128, 128, 128)
    dropout_prob: float = 0.2

    def setup(self):
        self._setup_context()
        self.mlp_layers = MLPLayers(
            (self.in_feature_num,) + tuple(self.mlp_hidden_size),
            dropout=self.dropout_prob,
        )
        self.deep_predict_layer = nn.Dense(1, kernel_init=xavier_normal)

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)
        b = emb.shape[0]
        y_fm = self.first_order_linear(batch, estate) + fm_second_order(emb)
        y_deep = self.deep_predict_layer(
            self.mlp_layers(emb.reshape(b, -1), train=train)
        )
        return (y_fm + y_deep).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field],
            batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
