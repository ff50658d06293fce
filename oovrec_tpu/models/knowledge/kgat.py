"""KGAT (reference `knowledge_aware_recommender/kgat.py`): graph attention
propagation over the collaborative knowledge graph (users ∪ entities),
attention weights from a TransR-style head-relation-tail score.

TPU-native: CKG edges live in estate as static arrays; attention softmax
normalizes per destination with two segment reductions — no sparse-matrix
library involved."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class KGAT(GeneralRecommender):
    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    kg_embedding_size: int = 64
    layers: Tuple[int, ...] = (64,)
    reg_weight: float = 1e-5
    mess_dropout: float = 0.1

    def setup(self):
        D = self.embedding_size
        # node space: users first, then entities (items = entities[:n_items])
        self.node_embedding = nn.Embed(
            self.n_users + self.n_entities, D, embedding_init=xavier_normal
        )
        self.relation_embedding = nn.Embed(
            self.n_relations, self.kg_embedding_size,
            embedding_init=xavier_normal,
        )
        self.trans_w = self.param(
            "trans_w", xavier_normal,
            (self.n_relations, D * self.kg_embedding_size),
        )
        self.agg_w1 = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"w1_{i}")
            for i, h in enumerate(self.layers)
        ]
        self.agg_w2 = [
            nn.Dense(h, kernel_init=xavier_normal, name=f"w2_{i}")
            for i, h in enumerate(self.layers)
        ]
        self.mdrop = nn.Dropout(self.mess_dropout)

    def _attention(self, e, estate):
        """π(h, r, t) = (W_r e_t)ᵀ tanh(W_r e_h + e_r), softmax per head."""
        src = estate["ckg_src"]
        dst = estate["ckg_dst"]
        rel = estate["ckg_rel"]
        W = self.trans_w[rel].reshape(
            -1, self.embedding_size, self.kg_embedding_size
        )
        eh = jnp.einsum("ed,edk->ek", e[src], W)
        et = jnp.einsum("ed,edk->ek", e[dst], W)
        er = self.relation_embedding(rel)
        logits = jnp.sum(et * jnp.tanh(eh + er), axis=1)
        # per-destination softmax via two segment reductions
        n = self.n_users + self.n_entities
        mx = jax.ops.segment_max(logits, dst, num_segments=n)
        ex = jnp.exp(logits - mx[dst])
        denom = jax.ops.segment_sum(ex, dst, num_segments=n)
        return ex / jnp.maximum(denom[dst], 1e-12)

    def _propagate(self, estate, train: bool = False):
        e = self.node_embedding.embedding
        att = self._attention(e, estate)
        src = estate["ckg_src"]
        dst = estate["ckg_dst"]
        n = self.n_users + self.n_entities
        outs = [e]
        cur = e
        for w1, w2 in zip(self.agg_w1, self.agg_w2):
            side = jax.ops.segment_sum(
                cur[src] * att[:, None], dst, num_segments=n
            )
            # bi-interaction aggregator
            cur = nn.leaky_relu(w1(cur + side)) + nn.leaky_relu(w2(cur * side))
            cur = self.mdrop(cur, deterministic=not train)
            cur = cur / jnp.maximum(
                jnp.linalg.norm(cur, axis=-1, keepdims=True), 1e-12
            )
            outs.append(cur)
        all_e = jnp.concatenate(outs, axis=1)
        users = all_e[: self.n_users]
        items = all_e[self.n_users : self.n_users + self.n_items]
        return users, items

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._propagate(estate, train=True)
        u = ue[batch[self.uid_field]]
        p = ie[batch[self.iid_field]]
        n = ie[batch[self.neg_prefix + self.iid_field]]
        w = batch.get("weight")
        mf = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1), w)

        # TransR KG loss on the sampled triple block
        h = self.node_embedding(self.n_users + batch["kg_head"])
        pt = self.node_embedding(self.n_users + batch["kg_pos_tail"])
        nt = self.node_embedding(self.n_users + batch["kg_neg_tail"])
        rel = batch["kg_relation"]
        W = self.trans_w[rel].reshape(
            -1, self.embedding_size, self.kg_embedding_size
        )
        ph = jnp.einsum("bd,bdk->bk", h, W)
        ppt = jnp.einsum("bd,bdk->bk", pt, W)
        pnt = jnp.einsum("bd,bdk->bk", nt, W)
        er = self.relation_embedding(rel)
        pos_d = jnp.sum((ph + er - ppt) ** 2, axis=1)
        neg_d = jnp.sum((ph + er - pnt) ** 2, axis=1)
        kg = bpr_loss(-pos_d, -neg_d, batch.get("kg_weight"))
        reg = emb_loss(u, p, n)
        return mf + kg + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        ue, ie = self._propagate(estate)
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self._propagate(estate)
        return ue[batch[self.uid_field]] @ ie.T

    @staticmethod
    def build_estate(train_split) -> dict:
        """Collaborative KG edges: interaction edges (user ↔ item, the
        trailing [UI-Relation]) + KG triples both directions."""
        ds = train_split.parent
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        n_users = ds.user_num
        heads, rels, tails = ds.kg_triples
        ui_rel = ds.relation_num - 1
        src = np.concatenate([
            uid, iid + n_users,                  # interact both ways
            heads + n_users, tails + n_users,    # kg both ways
        ]).astype(np.int32)
        dst = np.concatenate([
            iid + n_users, uid,
            tails + n_users, heads + n_users,
        ]).astype(np.int32)
        rel = np.concatenate([
            np.full(len(uid), ui_rel), np.full(len(uid), ui_rel),
            rels, rels,
        ]).astype(np.int32)
        return {"ckg_src": src, "ckg_dst": dst, "ckg_rel": rel}
