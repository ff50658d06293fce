"""Knowledge recommenders, second batch.

References: `knowledge_aware_recommender/kgcn.py`, `mkr.py`, `ktup.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bce_with_logits, bpr_loss
from oovrec_tpu.utils.enums import InputType, ModelType
from oovrec_tpu.utils.seeding import host_rng


@register_model
class KGCN(GeneralRecommender):
    """KGCN (`kgcn.py`): user-personalized relation attention over a fixed
    sampled neighborhood of each item entity; BCE on pointwise pairs.

    The per-entity neighbor sample (size `neighbor_sample_size`) is drawn
    once on the host into estate — static shapes on device."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.POINTWISE

    n_entities: int = 0
    n_relations: int = 0
    neighbor_sample_size: int = 4
    n_iter: int = 1
    aggregator: str = "sum"

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(self.n_relations, D,
                                           embedding_init=xavier_normal)
        self.agg_layers = [
            nn.Dense(D, kernel_init=xavier_normal, name=f"agg_{i}")
            for i in range(self.n_iter)
        ]

    def _item_repr(self, users, items, estate):
        """One-hop (n_iter-hop) aggregation with user-relation scores."""
        u = self.user_embedding(users)                       # (B, D)
        ent = items
        e_self = self.entity_embedding(ent)                  # (B, D)
        for hop, agg in enumerate(self.agg_layers):
            neigh = estate["kg_neighbors"][ent]              # (B, S)
            rels = estate["kg_neighbor_rels"][ent]           # (B, S)
            ne = self.entity_embedding(neigh)                # (B, S, D)
            re = self.relation_embedding(rels)               # (B, S, D)
            score = nn.softmax(
                jnp.sum(u[:, None, :] * re, axis=-1), axis=1
            )                                                # (B, S)
            agg_n = jnp.sum(score[:, :, None] * ne, axis=1)  # (B, D)
            if self.aggregator == "concat":
                e_self = agg(jnp.concatenate([e_self, agg_n], axis=-1))
            elif self.aggregator == "neighbor":
                e_self = agg(agg_n)
            else:  # sum
                e_self = agg(e_self + agg_n)
            e_self = nn.tanh(e_self) if hop == self.n_iter - 1 else nn.relu(e_self)
        return u, e_self

    def calculate_loss(self, batch: Batch, estate=None):
        u, i = self._item_repr(
            batch[self.uid_field], batch[self.iid_field], estate
        )
        out = jnp.sum(u * i, axis=1)
        return bce_with_logits(out, batch[self.label_field], batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        u, i = self._item_repr(
            batch[self.uid_field], batch[self.iid_field], estate
        )
        return nn.sigmoid(jnp.sum(u * i, axis=1))

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_block(item_block):
            u, i = self._item_repr(
                jnp.repeat(users, 1), item_block, estate
            )
            return jnp.sum(u * i, axis=1)

        # vmapping over items with fixed users: compute per item column
        def per_item(it):
            u, i = self._item_repr(
                users, jnp.broadcast_to(it, users.shape), estate
            )
            return jnp.sum(u * i, axis=1)

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))

    @staticmethod
    def build_estate(train_split, neighbor_sample_size: int = 4,
                     seed: int = 2020) -> dict:
        ds = train_split.parent
        heads, rels, tails = ds.kg_triples
        n_ent = ds.entity_num
        rng = host_rng(seed, "kgcn_neighbors")
        adj = [[] for _ in range(n_ent)]
        for h, r, t in zip(heads, rels, tails):
            adj[h].append((t, r))
            adj[t].append((h, r))
        S = neighbor_sample_size
        neigh = np.zeros((n_ent, S), np.int64)
        nrels = np.zeros((n_ent, S), np.int64)
        for e in range(n_ent):
            if adj[e]:
                picks = rng.integers(0, len(adj[e]), S)
                for j, p in enumerate(picks):
                    neigh[e, j], nrels[e, j] = adj[e][p]
            else:
                neigh[e, :] = e  # self-loop fallback
        return {"kg_neighbors": neigh, "kg_neighbor_rels": nrels}


class CrossCompress(nn.Module):
    """MKR cross&compress unit (`mkr.py`): C = v eᵀ; outputs project C and
    Cᵀ through learned weight vectors."""

    dim: int

    @nn.compact
    def __call__(self, v, e):
        # v, e: (B, D)
        C = v[:, :, None] * e[:, None, :]                 # (B, D, D)
        w_vv = self.param("w_vv", xavier_normal, (self.dim, 1))
        w_ev = self.param("w_ev", xavier_normal, (self.dim, 1))
        w_ve = self.param("w_ve", xavier_normal, (self.dim, 1))
        w_ee = self.param("w_ee", xavier_normal, (self.dim, 1))
        b_v = self.param("b_v", nn.initializers.zeros, (self.dim,))
        b_e = self.param("b_e", nn.initializers.zeros, (self.dim,))
        v_out = (C @ w_vv + jnp.transpose(C, (0, 2, 1)) @ w_ev).squeeze(-1)
        e_out = (C @ w_ve + jnp.transpose(C, (0, 2, 1)) @ w_ee).squeeze(-1)
        return v_out + b_v, e_out + b_e


@register_model
class MKR(GeneralRecommender):
    """MKR (`mkr.py`): multi-task — rec towers and a KG TransE-ish head
    share low layers through cross&compress units over (item, entity)."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.POINTWISE

    n_entities: int = 0
    n_relations: int = 0
    low_layers_num: int = 1
    high_layers_num: int = 1
    kg_weight: float = 1.0

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(self.n_relations, D,
                                           embedding_init=xavier_normal)
        self.user_mlps = [
            nn.Dense(D, kernel_init=xavier_normal, name=f"um_{i}")
            for i in range(self.low_layers_num)
        ]
        self.tail_mlps = [
            nn.Dense(D, kernel_init=xavier_normal, name=f"tm_{i}")
            for i in range(self.low_layers_num)
        ]
        self.cc_units = [
            CrossCompress(D, name=f"cc_{i}")
            for i in range(self.low_layers_num)
        ]
        self.kge_mlp = nn.Dense(D, kernel_init=xavier_normal)

    def _low(self, users, items):
        u = self.user_embedding(users)
        v = self.item_embedding(items)
        e = self.entity_embedding(items)  # item-aligned entities
        for um, cc in zip(self.user_mlps, self.cc_units):
            u = nn.relu(um(u))
            v, e = cc(v, e)
        return u, v, e

    def calculate_loss(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        items = batch[self.iid_field]
        u, v, _ = self._low(users, items)
        out = jnp.sum(u * v, axis=1)
        rec = bce_with_logits(out, batch[self.label_field], batch.get("weight"))

        # KG task: predict tail from (head processed by cc, relation)
        h = batch["kg_head"]
        t = self.entity_embedding(batch["kg_pos_tail"])
        for tm in self.tail_mlps:
            t = nn.relu(tm(t))
        hv = self.item_embedding(jnp.clip(h, 0, self.n_items - 1))
        he = self.entity_embedding(h)
        for cc in self.cc_units:
            hv, he = cc(hv, he)
        r = self.relation_embedding(batch["kg_relation"])
        pred_t = self.kge_mlp(jnp.concatenate([he, r], axis=-1))
        kg_score = -jnp.sum((pred_t - t) ** 2, axis=1)
        kgw = batch.get("kg_weight")
        kg_loss = -jnp.mean(kg_score if kgw is None else kg_score * kgw)
        return rec + self.kg_weight * kg_loss

    def predict(self, batch: Batch, estate=None):
        u, v, _ = self._low(batch[self.uid_field], batch[self.iid_field])
        return nn.sigmoid(jnp.sum(u * v, axis=1))

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_item(it):
            u, v, _ = self._low(users, jnp.broadcast_to(it, users.shape))
            return jnp.sum(u * v, axis=1)

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))
