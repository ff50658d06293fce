"""FFM (`context_aware_recommender/ffm.py`): field-aware factorization —
every feature keeps one latent vector PER other field; pairwise scores use
the field-targeted vectors. + first-order linear, BCE-with-logits."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.context import ContextRecommender
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bce_with_logits


@register_model
class FFM(ContextRecommender):
    def setup(self):
        self._setup_context()
        F = self.fields.num_feature_field
        self._F = F
        # token fields only get field-aware tables in the reference; we use
        # the concatenated field embeddings and a per-(field, field) dense
        # reprojection — same capacity class, TPU-batched as one einsum
        self.field_proj = self.param(
            "field_proj", xavier_normal,
            (F, F, self.embedding_size, self.embedding_size),
        )

    def forward(self, batch: Batch, estate=None, train: bool = False):
        emb = self.concat_embed_input_fields(batch, estate)  # (B, F, D)
        # e[f→g] = emb[f] @ W[f, g]
        proj = jnp.einsum("bfd,fgde->bfge", emb, self.field_proj)
        iu, ju = jnp.triu_indices(self._F, k=1)
        # field-aware pair score: <e_i→j, e_j→i>
        a = proj[:, iu, ju, :]
        b = proj[:, ju, iu, :]
        second = jnp.sum(a * b, axis=(1, 2))
        return self.first_order_linear(batch, estate).squeeze(-1) + second

    def calculate_loss(self, batch: Batch, estate=None):
        return bce_with_logits(
            self.forward(batch, estate, train=True),
            batch[self.label_field], batch.get("weight"),
        )

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(self.forward(batch, estate))
