"""Knowledge recommenders, third batch.

References: `knowledge_aware_recommender/ktup.py`, `kgnnls.py`,
`ripplenet.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.knowledge.more import KGCN
from oovrec_tpu.models.losses import bce_with_logits, bpr_loss
from oovrec_tpu.utils.enums import InputType, ModelType
from oovrec_tpu.utils.seeding import host_rng


@register_model
class KTUP(GeneralRecommender):
    """KTUP (`ktup.py`): joint TUP (preference-aware translation for rec)
    + TransH (KG) with hyperplane projections; BPR on both tasks."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    use_st_gumbel: bool = False
    kg_weight: float = 1.0

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.pref_embedding = nn.Embed(self.n_relations, D,
                                       embedding_init=xavier_normal)
        self.pref_norm = nn.Embed(self.n_relations, D,
                                  embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(self.n_relations, D,
                                           embedding_init=xavier_normal)
        self.relation_norm = nn.Embed(self.n_relations, D,
                                      embedding_init=xavier_normal)

    def _preference(self, u, i):
        """Soft preference over relations from u+i agreement."""
        logits = (u + i) @ (
            self.pref_embedding.embedding + self.relation_embedding.embedding
        ).T / 2.0
        probs = nn.softmax(logits, axis=-1)
        pref = probs @ self.pref_embedding.embedding
        norm = probs @ self.pref_norm.embedding
        return pref, norm

    @staticmethod
    def _project(e, norm):
        norm = norm / jnp.sqrt(jnp.sum(norm**2, axis=-1, keepdims=True) + 1e-12)
        return e - jnp.sum(e * norm, axis=-1, keepdims=True) * norm

    def _rec_score(self, users, items):
        u = self.user_embedding(users)
        i = self.item_embedding(items) + self.entity_embedding(
            jnp.clip(items, 0, self.n_entities - 1)
        )
        pref, norm = self._preference(u, i)
        pu = self._project(u, norm)
        pi = self._project(i, norm)
        return -jnp.sum((pu + pref - pi) ** 2, axis=-1)

    def calculate_loss(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        rec = bpr_loss(
            self._rec_score(users, batch[self.iid_field]),
            self._rec_score(users, batch[self.neg_prefix + self.iid_field]),
            batch.get("weight"),
        )
        # TransH KG task
        h = self.entity_embedding(batch["kg_head"])
        pt = self.entity_embedding(batch["kg_pos_tail"])
        nt = self.entity_embedding(batch["kg_neg_tail"])
        r = self.relation_embedding(batch["kg_relation"])
        w = self.relation_norm(batch["kg_relation"])
        ph, ppt, pnt = (
            self._project(h, w), self._project(pt, w), self._project(nt, w)
        )
        pos_d = jnp.sum((ph + r - ppt) ** 2, axis=-1)
        neg_d = jnp.sum((ph + r - pnt) ** 2, axis=-1)
        kg = bpr_loss(-pos_d, -neg_d, batch.get("kg_weight"))
        return rec + self.kg_weight * kg

    def predict(self, batch: Batch, estate=None):
        return self._rec_score(batch[self.uid_field], batch[self.iid_field])

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_item(it):
            return self._rec_score(users, jnp.broadcast_to(it, users.shape))

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))


@register_model
class KGNNLS(KGCN):
    """KGNN-LS (`kgnnls.py`): KGCN aggregation + label-smoothness
    regularization over the sampled neighborhood (simplified: consistency
    between an item's predicted score and its neighbors' scores)."""

    ls_weight: float = 0.5

    def calculate_loss(self, batch: Batch, estate=None):
        users = batch[self.uid_field]
        items = batch[self.iid_field]
        u, i = self._item_repr(users, items, estate)
        out = jnp.sum(u * i, axis=1)
        base = bce_with_logits(out, batch[self.label_field], batch.get("weight"))
        # label smoothness: neighbors of the item should score similarly
        neigh = estate["kg_neighbors"][items][:, 0]
        un, inn = self._item_repr(users, neigh, estate)
        out_n = jnp.sum(un * inn, axis=1)
        w = batch.get("weight")
        ls = (out - out_n) ** 2
        ls = jnp.mean(ls) if w is None else (
            jnp.sum(ls * w) / jnp.maximum(jnp.sum(w), 1.0)
        )
        return base + self.ls_weight * ls


@register_model
class RippleNet(GeneralRecommender):
    """RippleNet (`ripplenet.py`): multi-hop "ripple" propagation of the
    user's history through the KG; per-hop attention over (h, r, t)
    triples seeds the user representation.

    Hop sets are sampled host-side into estate:
      ripple_h/r/t[hop][user] : (n_users, memory) int arrays."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.POINTWISE

    n_entities: int = 0
    n_relations: int = 0
    n_hop: int = 2
    n_memory: int = 8
    kge_weight: float = 0.01

    def setup(self):
        D = self.embedding_size
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(
            self.n_relations, D * D, embedding_init=xavier_normal
        )
        self.transform = nn.Dense(D, use_bias=False,
                                  kernel_init=xavier_normal)

    def _user_repr(self, users, item_e, estate):
        D = self.embedding_size
        o_list = []
        v = item_e
        for hop in range(self.n_hop):
            h = estate[f"ripple_h{hop}"][users]   # (B, M)
            r = estate[f"ripple_r{hop}"][users]
            t = estate[f"ripple_t{hop}"][users]
            he = self.entity_embedding(h)          # (B, M, D)
            te = self.entity_embedding(t)
            Re = self.relation_embedding(r).reshape(
                h.shape[0], h.shape[1], D, D
            )
            Rh = jnp.einsum("bmde,bme->bmd", Re, he)
            probs = nn.softmax(
                jnp.sum(Rh * v[:, None, :], axis=-1), axis=1
            )
            o = jnp.sum(probs[:, :, None] * te, axis=1)
            o_list.append(o)
            v = self.transform(v + o)
        return sum(o_list)

    def _score(self, users, items, estate):
        item_e = self.entity_embedding(
            jnp.clip(items, 0, self.n_entities - 1)
        )
        u = self._user_repr(users, item_e, estate)
        return jnp.sum(u * item_e, axis=1)

    def calculate_loss(self, batch: Batch, estate=None):
        out = self._score(batch[self.uid_field], batch[self.iid_field], estate)
        return bce_with_logits(out, batch[self.label_field], batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        return nn.sigmoid(
            self._score(batch[self.uid_field], batch[self.iid_field], estate)
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users = batch[self.uid_field]

        def per_item(it):
            return self._score(users, jnp.broadcast_to(it, users.shape), estate)

        return jax.vmap(per_item, out_axes=1)(jnp.arange(self.n_items))

    @staticmethod
    def build_estate(train_split, n_hop: int = 2, n_memory: int = 8,
                     seed: int = 2020) -> dict:
        ds = train_split.parent
        heads, rels, tails = ds.kg_triples
        rng = host_rng(seed, "ripple_sets")
        adj = {}
        for h, r, t in zip(heads, rels, tails):
            adj.setdefault(int(h), []).append((int(r), int(t)))
        per_user = train_split.used_ids_per_user()
        n_users = train_split.user_num
        state = {}
        seeds = [np.asarray(p, dtype=np.int64) for p in per_user]
        for hop in range(n_hop):
            H = np.zeros((n_users, n_memory), np.int64)
            R = np.zeros((n_users, n_memory), np.int64)
            T = np.zeros((n_users, n_memory), np.int64)
            next_seeds = []
            for u in range(n_users):
                triples = []
                for e in seeds[u]:
                    for r, t in adj.get(int(e), []):
                        triples.append((int(e), r, t))
                if triples:
                    picks = rng.integers(0, len(triples), n_memory)
                    for j, p in enumerate(picks):
                        H[u, j], R[u, j], T[u, j] = triples[p]
                    next_seeds.append(T[u])
                else:
                    next_seeds.append(seeds[u])
            state[f"ripple_h{hop}"] = H
            state[f"ripple_r{hop}"] = R
            state[f"ripple_t{hop}"] = T
            seeds = next_seeds
        return state
