"""CFKG (reference `knowledge_aware_recommender/cfkg.py`): users, items
and entities in one TransE space; the interaction is a [UI-Relation]
triple (user + r_ui ≈ item); margin or inner-product distance."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class CFKG(GeneralRecommender):
    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    loss_function: str = "inner_product"
    margin: float = 1.0

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.entity_embedding = nn.Embed(
            self.n_entities, self.embedding_size, embedding_init=xavier_normal
        )
        # relations incl. the trailing [UI-Relation]
        self.relation_embedding = nn.Embed(
            self.n_relations, self.embedding_size, embedding_init=xavier_normal
        )

    def _ui_rel(self):
        return self.relation_embedding.embedding[self.n_relations - 1]

    def _score(self, h, r, t):
        if self.loss_function == "transe":
            return -jnp.linalg.norm(h + r - t, axis=-1)
        return jnp.sum((h + r) * t, axis=-1)

    def calculate_loss(self, batch: Batch, estate=None):
        w = batch.get("weight")
        u = self.user_embedding(batch[self.uid_field])
        pos_i = self.entity_embedding(batch[self.iid_field])
        neg_i = self.entity_embedding(batch[self.neg_prefix + self.iid_field])
        r_ui = jnp.broadcast_to(self._ui_rel(), u.shape)
        rec_pos = self._score(u, r_ui, pos_i)
        rec_neg = self._score(u, r_ui, neg_i)

        h = self.entity_embedding(batch["kg_head"])
        r = self.relation_embedding(batch["kg_relation"])
        pos_t = self.entity_embedding(batch["kg_pos_tail"])
        neg_t = self.entity_embedding(batch["kg_neg_tail"])
        kg_pos = self._score(h, r, pos_t)
        kg_neg = self._score(h, r, neg_t)
        kgw = batch.get("kg_weight")

        from oovrec_tpu.models.losses import bpr_loss

        return bpr_loss(rec_pos, rec_neg, w) + bpr_loss(kg_pos, kg_neg, kgw)

    def predict(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        i = self.entity_embedding(batch[self.iid_field])
        r = jnp.broadcast_to(self._ui_rel(), u.shape)
        return self._score(u, r, i)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        r = self._ui_rel()[None, :]
        items = self.entity_embedding.embedding[: self.n_items]
        if self.loss_function == "transe":
            d = (u + r)[:, None, :] - items[None, :, :]
            return -jnp.linalg.norm(d, axis=-1)
        return (u + r) @ items.T
