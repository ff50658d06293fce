"""CKE (reference `knowledge_aware_recommender/cke.py`): BPR over
(item ⊕ entity) embeddings + TransR-style KG loss.

Batch carries both rec fields and a sampled KG triple block
(kg_head, kg_relation, kg_pos_tail, kg_neg_tail) — the KG-aware batcher
joins them (knowledge_dataloader analog)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class CKE(GeneralRecommender):
    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    kg_embedding_size: int = 64
    reg_weights: tuple = (1e-2, 1e-2)

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )
        self.entity_embedding = nn.Embed(
            self.n_entities, self.embedding_size, embedding_init=xavier_normal
        )
        self.relation_embedding = nn.Embed(
            self.n_relations, self.kg_embedding_size,
            embedding_init=xavier_normal,
        )
        # TransR projection per relation: (n_rel, emb, kg_emb)
        self.trans_w = self.param(
            "trans_w", xavier_normal,
            (self.n_relations, self.embedding_size * self.kg_embedding_size),
        )

    def _item_full(self, ids):
        return self.item_embedding(ids) + self.entity_embedding(ids)

    def _kg_score(self, h, r, pos_t, neg_t):
        pe = self.entity_embedding(h)
        pt = self.entity_embedding(pos_t)
        nt = self.entity_embedding(neg_t)
        re = self.relation_embedding(r)
        W = self.trans_w[r].reshape(
            -1, self.embedding_size, self.kg_embedding_size
        )
        ph = jnp.einsum("bd,bdk->bk", pe, W)
        ppt = jnp.einsum("bd,bdk->bk", pt, W)
        pnt = jnp.einsum("bd,bdk->bk", nt, W)

        def norm(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )

        ph, ppt, pnt, re = norm(ph), norm(ppt), norm(pnt), norm(re)
        pos_s = jnp.sum((ph + re - ppt) ** 2, axis=1)
        neg_s = jnp.sum((ph + re - pnt) ** 2, axis=1)
        return pos_s, neg_s, (ph, re, ppt, pnt)

    def calculate_loss(self, batch: Batch, estate=None):
        user = batch[self.uid_field]
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        w = batch.get("weight")
        u = self.user_embedding(user)
        p = self._item_full(pos)
        n = self._item_full(neg)
        rec_loss = bpr_loss(
            jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1), w
        )
        # kg part: -log σ(neg_score − pos_score) (distance: smaller better)
        pos_s, neg_s, kg_embs = self._kg_score(
            batch["kg_head"], batch["kg_relation"],
            batch["kg_pos_tail"], batch["kg_neg_tail"],
        )
        kgw = batch.get("kg_weight")
        kg_loss = bpr_loss(-pos_s, -neg_s, kgw)
        reg1, reg2 = self.reg_weights
        reg = reg1 * emb_loss(u, p, n) + reg2 * emb_loss(*kg_embs)
        return rec_loss + kg_loss + reg

    def predict(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        i = self._item_full(batch[self.iid_field])
        return jnp.sum(u * i, axis=1)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self.user_embedding(batch[self.uid_field])
        all_i = (
            self.item_embedding.embedding
            + self.entity_embedding.embedding[: self.n_items]
        )
        return u @ all_i.T
