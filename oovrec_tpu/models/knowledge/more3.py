"""Knowledge recommenders, fourth batch: KGIN, MCCLK.

References: `knowledge_aware_recommender/kgin.py`, `mcclk.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType, ModelType


def _l2norm(x, axis=-1):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def _kg_edge_estate(train_split) -> dict:
    """Directed KG edge lists + user→item interaction edges with 1/deg
    normalization (si-norm, `kgin.py:327-339`)."""
    ds = train_split.parent
    uid = np.asarray(train_split.inter[train_split.uid_field], np.int32)
    iid = np.asarray(train_split.inter[train_split.iid_field], np.int32)
    heads, rels, tails = ds.kg_triples
    deg = np.bincount(uid, minlength=ds.user_num).astype(np.float32)
    w = 1.0 / np.maximum(deg[uid], 1.0)
    return {
        "kgin_head": np.asarray(heads, np.int32),
        "kgin_rel": np.asarray(rels, np.int32),
        "kgin_tail": np.asarray(tails, np.int32),
        "kgin_uid": uid,
        "kgin_iid": iid,
        "kgin_w": w.astype(np.float32),
    }


@register_model
class KGIN(GeneralRecommender):
    """KGIN (`kgin.py`): relation-aware KG aggregation with user intents —
    each user attends over `n_factors` latent intents that are softmax
    mixtures of relation embeddings; an independence (distance-
    correlation) penalty keeps intents disentangled."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    n_factors: int = 4
    context_hops: int = 2
    sim_decay: float = 1e-4
    reg_weight: float = 1e-5
    mess_dropout_rate: float = 0.1

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(self.n_relations, D,
                                           embedding_init=xavier_normal)
        self.latent_emb = self.param("latent_emb", xavier_normal,
                                     (self.n_factors, self.embedding_size))
        self.disen_att = self.param("disen_weight_att", xavier_normal,
                                    (self.n_factors, self.n_relations))
        self.mdrop = nn.Dropout(self.mess_dropout_rate)

    def _propagate(self, estate, train=False):
        head, rel, tail = (estate["kgin_head"], estate["kgin_rel"],
                           estate["kgin_tail"])
        uid, iid, w = estate["kgin_uid"], estate["kgin_iid"], estate["kgin_w"]
        rel_e = self.relation_embedding.embedding
        ue = self.user_embedding.embedding
        ee = self.entity_embedding.embedding
        u_res, e_res = ue, ee
        # user→factor attention and factor vectors (kgin.py:69-80)
        score = nn.softmax(ue @ self.latent_emb.T, axis=1)  # (U, F)
        disen = nn.softmax(self.disen_att, axis=-1) @ rel_e  # (F, D)
        for _ in range(self.context_hops):
            # entity aggregate: mean over incoming (tail * rel) messages
            msg = ee[tail] * rel_e[rel]
            agg = jax.ops.segment_sum(msg, head,
                                      num_segments=self.n_entities)
            cnt = jax.ops.segment_sum(jnp.ones_like(head, jnp.float32),
                                      head, num_segments=self.n_entities)
            ee_new = agg / jnp.maximum(cnt, 1.0)[:, None]
            # user aggregate: weighted sum of item entities + intent gate
            u_agg = jax.ops.segment_sum(ee[iid] * w[:, None], uid,
                                        num_segments=self.n_users)
            u_new = (score @ disen) * u_agg + u_agg
            ee = _l2norm(self.mdrop(ee_new, deterministic=not train))
            ue = _l2norm(self.mdrop(u_new, deterministic=not train))
            e_res = e_res + ee
            u_res = u_res + ue
        return u_res, e_res[: self.n_items]

    def _cor_loss(self):
        """Distance correlation between intent rows (`kgin.py:195-249`)."""
        t = self.disen_att  # (F, R)

        def dcov(a, b):
            # 1-D distance covariance over the R columns
            da = jnp.abs(a[:, None] - a[None, :])
            db = jnp.abs(b[:, None] - b[None, :])
            ca = da - da.mean(0, keepdims=True) - da.mean(1, keepdims=True) + da.mean()
            cb = db - db.mean(0, keepdims=True) - db.mean(1, keepdims=True) + db.mean()
            return jnp.sqrt(jnp.maximum((ca * cb).mean(), 1e-12))

        cor = 0.0
        for i in range(self.n_factors):
            for j in range(i + 1, self.n_factors):
                cor = cor + dcov(t[i], t[j]) / jnp.sqrt(
                    jnp.maximum(dcov(t[i], t[i]) * dcov(t[j], t[j]), 1e-12)
                )
        return cor

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self._propagate(estate, train=True)
        u = ue[batch[self.uid_field]]
        p = ie[batch[self.iid_field]]
        n = ie[batch[self.neg_prefix + self.iid_field]]
        w = batch.get("weight")
        mf = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1), w)
        return (mf + self.reg_weight * emb_loss(u, p, n)
                + self.sim_decay * self._cor_loss())

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
        return _kg_edge_estate(train_split)


@register_model
class MCCLK(GeneralRecommender):
    """MCCLK (`mcclk.py`): multi-level cross-view contrastive learning —
    collaborative view (LightGCN over interactions), structural/semantic
    view (relation-aware KG aggregation + item-item kNN graph built from
    entity embeddings on device). InfoNCE at the local level (between the
    two item views) and global level (fused vs. collaborative), on top of
    BPR. The kNN adjacency is a dense top-k per row — same cost shape as
    the reference's `build_adj` (`mcclk.py:218-262`)."""

    model_type = ModelType.KNOWLEDGE
    input_type = InputType.PAIRWISE

    n_entities: int = 0
    n_relations: int = 0
    n_hops: int = 1
    lightgcn_layer: int = 2
    knn_k: int = 8
    tau: float = 0.8
    alpha: float = 0.5
    beta: float = 0.1
    reg_weight: float = 1e-5

    def setup(self):
        D = self.embedding_size
        self.user_embedding = nn.Embed(self.n_users, D,
                                       embedding_init=xavier_normal)
        self.entity_embedding = nn.Embed(self.n_entities, D,
                                         embedding_init=xavier_normal)
        self.relation_embedding = nn.Embed(self.n_relations, D,
                                           embedding_init=xavier_normal)
        self.proj_local = [nn.Dense(D, kernel_init=xavier_normal,
                                    name=f"pl_{i}") for i in range(2)]
        self.proj_global = [nn.Dense(D, kernel_init=xavier_normal,
                                     name=f"pg_{i}") for i in range(2)]

    # ----- views -----
    def _structural_items(self, estate):
        head, rel, tail = (estate["kgin_head"], estate["kgin_rel"],
                           estate["kgin_tail"])
        ee = self.entity_embedding.embedding
        rel_e = self.relation_embedding.embedding
        for _ in range(self.n_hops):
            msg = ee[tail] * rel_e[rel]
            agg = jax.ops.segment_sum(msg, head,
                                      num_segments=self.n_entities)
            cnt = jax.ops.segment_sum(jnp.ones_like(head, jnp.float32),
                                      head, num_segments=self.n_entities)
            ee = _l2norm(agg / jnp.maximum(cnt, 1.0)[:, None] + ee)
        return ee[: self.n_items]

    def _semantic_items(self, item_ent):
        """kNN graph over item entity embeddings; one propagation step."""
        sim = _l2norm(item_ent) @ _l2norm(item_ent).T  # (I, I)
        k = min(self.knn_k, sim.shape[1])
        kth = jax.lax.top_k(sim, k)[0][:, -1][:, None]
        adj = jnp.where(sim >= kth, sim, 0.0)
        adj = adj / jnp.maximum(adj.sum(axis=1, keepdims=True), 1e-12)
        return adj @ item_ent

    def _collab(self, estate):
        uid, iid, w = estate["kgin_uid"], estate["kgin_iid"], estate["kgin_w"]
        ue, ie = (self.user_embedding.embedding,
                  self.entity_embedding.embedding[: self.n_items])
        u_res, i_res = ue, ie
        for _ in range(self.lightgcn_layer):
            u_new = jax.ops.segment_sum(ie[iid] * w[:, None], uid,
                                        num_segments=self.n_users)
            icnt = jax.ops.segment_sum(jnp.ones_like(iid, jnp.float32), iid,
                                       num_segments=self.n_items)
            i_new = jax.ops.segment_sum(ue[uid], iid,
                                        num_segments=self.n_items)
            i_new = i_new / jnp.maximum(icnt, 1.0)[:, None]
            ue, ie = u_new, i_new
            u_res = u_res + ue
            i_res = i_res + ie
        return u_res, i_res

    def _views(self, estate):
        item_struct = self._structural_items(estate)      # view 2
        item_sem = self._semantic_items(item_struct)      # view 3
        u_col, item_col = self._collab(estate)            # view 1
        users = u_col
        items = item_col + item_struct + item_sem
        return users, items, item_col, item_struct, item_sem

    @staticmethod
    def _infonce(z1, z2, tau):
        z1, z2 = _l2norm(z1), _l2norm(z2)
        logits = (z1 @ z2.T) / tau
        labels = jnp.arange(z1.shape[0])
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.mean(logp[labels, labels])

    def calculate_loss(self, batch: Batch, estate=None):
        users, items, i_col, i_struct, i_sem = self._views(estate)
        u = users[batch[self.uid_field]]
        pos = batch[self.iid_field]
        p = items[pos]
        n = items[batch[self.neg_prefix + self.iid_field]]
        w = batch.get("weight")
        rec = bpr_loss(jnp.sum(u * p, axis=1), jnp.sum(u * n, axis=1), w)
        # contrast only the batch's positive items (keeps the InfoNCE
        # denominator batch-sized; reference uses all items)
        z_col = self.proj_local[0](i_col[pos])
        z_struct = self.proj_local[1](i_struct[pos])
        z_sem = self.proj_local[1](i_sem[pos])
        local = self._infonce(z_struct, z_sem, self.tau)
        g1 = self.proj_global[0](i_sem[pos])
        g2 = self.proj_global[1]((i_col + i_struct)[pos])
        global_ = self._infonce(g1, g2, self.tau) + self._infonce(
            z_col, z_struct, self.tau
        )
        reg = emb_loss(u, p, n)
        return (rec + self.reg_weight * reg
                + self.beta * (self.alpha * local
                               + (1 - self.alpha) * global_))

    def predict(self, batch: Batch, estate=None):
        users, items, *_ = self._views(estate)
        return jnp.sum(
            users[batch[self.uid_field]] * items[batch[self.iid_field]],
            axis=1,
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        users, items, *_ = self._views(estate)
        return users[batch[self.uid_field]] @ items.T

    @staticmethod
    def build_estate(train_split) -> dict:
        return _kg_edge_estate(train_split)
