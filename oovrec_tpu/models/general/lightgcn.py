"""LightGCN (reference `general_recommender/lightgcn.py`): K-layer
linear propagation over the symmetric-normalized user-item graph, BPR loss
+ EmbLoss reg.

TPU-native: the sparse adjacency becomes static (src, dst, weight) edge
arrays in estate; propagation is `jax.ops.segment_sum` over edges — an
XLA scatter-add, no SpMM library needed."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss, emb_loss
from oovrec_tpu.utils.enums import InputType


@register_model
class LightGCN(GeneralRecommender):
    input_type = InputType.PAIRWISE
    n_layers: int = 2
    reg_weight: float = 1e-5

    def setup(self):
        self.user_embedding = nn.Embed(
            self.n_users, self.embedding_size, embedding_init=xavier_normal
        )
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size, embedding_init=xavier_normal
        )

    def propagate(self, estate):
        """K rounds of E ← Â E, mean over layer outputs."""
        src = estate["edge_src"]
        dst = estate["edge_dst"]
        w = estate["edge_weight"][:, None]
        n = self.n_users + self.n_items
        e = jnp.concatenate(
            [self.user_embedding.embedding, self.item_embedding.embedding],
            axis=0,
        )
        acc = e
        cur = e
        for _ in range(self.n_layers):
            cur = jax.ops.segment_sum(cur[src] * w, dst, num_segments=n)
            acc = acc + cur
        acc = acc / (self.n_layers + 1)
        return acc[: self.n_users], acc[self.n_users :]

    def calculate_loss(self, batch: Batch, estate=None):
        ue, ie = self.propagate(estate)
        user = batch[self.uid_field]
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        u, p, ng = ue[user], ie[pos], ie[neg]
        pos_s = jnp.sum(u * p, axis=1)
        neg_s = jnp.sum(u * ng, axis=1)
        mf = bpr_loss(pos_s, neg_s, batch.get("weight"))
        # reg on the EGO embeddings (pre-propagation), reference behavior
        reg = emb_loss(
            self.user_embedding(user),
            self.item_embedding(pos),
            self.item_embedding(neg),
        )
        return mf + self.reg_weight * reg

    def predict(self, batch: Batch, estate=None):
        ue, ie = self.propagate(estate)
        return jnp.sum(
            ue[batch[self.uid_field]] * ie[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        ue, ie = self.propagate(estate)
        return ue[batch[self.uid_field]] @ ie.T

    @staticmethod
    def build_estate(train_split) -> dict:
        """Symmetric-normalized bipartite edges (both directions)."""
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        n_u = train_split.user_num
        n_i = train_split.item_num
        du = np.zeros(n_u)
        di = np.zeros(n_i)
        np.add.at(du, uid, 1.0)
        np.add.at(di, iid, 1.0)
        w = 1.0 / np.sqrt(np.maximum(du[uid], 1) * np.maximum(di[iid], 1))
        src = np.concatenate([uid, iid + n_u]).astype(np.int32)
        dst = np.concatenate([iid + n_u, uid]).astype(np.int32)
        return {
            "edge_src": src,
            "edge_dst": dst,
            "edge_weight": np.concatenate([w, w]).astype(np.float32),
        }
