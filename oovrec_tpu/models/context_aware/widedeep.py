"""WideDeep (`recbole/model/context_aware_recommender/widedeep.py:24-92`):
wide = first-order linear, deep = MLP over concatenated field embeddings;
logits summed, BCE-with-logits loss; predict applies sigmoid."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.layers import MLPLayers
from oovrec_tpu.models.losses import bce_with_logits


@register_model
class WideDeep(ContextRecommender):
    # loss consumes inter columns + joined feature columns + label,
    # all of which the pointwise device epoch provides
    supports_device_epoch = True
    mlp_hidden_size: Tuple[int, ...] = (32, 16, 8)
    dropout_prob: float = 0.1

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
        fm_output = self.first_order_linear(batch, estate)
        deep = self.deep_predict_layer(
            self.mlp_layers(emb.reshape(b, -1), train=train)
        )
        return (fm_output + deep).squeeze(-1)

    def calculate_loss(self, batch: Batch, estate=None):
        label = batch[self.label_field]
        out = self.forward(batch, estate, train=True)
        return bce_with_logits(out, label, batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
