"""BPR — matrix-factorization two-tower trained pairwise.

TPU-native counterpart of `recbole/model/general_recommender/bpr.py:30-162`
(inductive variant): user/item tables + BPR loss; OOV rows route through
bucket tables or an embedder (`get_user_embedding` `bpr.py:48-78`,
`get_item_embedding` `bpr.py:94-125`) — here branchless via
`inductive.routing.route`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.utils.enums import InputType


@register_model
class BPR(GeneralRecommender):
    input_type = InputType.PAIRWISE
    # calculate_loss consumes only (uid, iid, neg_iid, weight) → eligible
    # for the device-resident epoch fast path (train/device_epoch.py)
    supports_device_epoch = True

    def setup(self):
        # _embed_table: nn.Embed, or the explicit row-sharded exchange
        # (ShardedEmbed) when `sharded_lookup != 'gspmd'` under a mesh
        self.user_embedding = self._embed_table(
            self.n_users, "user_embedding"
        )
        self.item_embedding = self._embed_table(
            self.n_items, "item_embedding"
        )
        self._setup_oov()

    def user_e(self, ids, batch: Batch, estate=None):
        return self._route_side(
            "user", self.user_embedding, ids, batch, estate,
            self.uid_field,
        )

    def item_e(self, ids, batch: Batch, estate=None, field=None):
        return self._route_side(
            "item", self.item_embedding, ids, batch, estate,
            field or self.iid_field,
        )

    def sparse_table_fields(self):
        """Sparse fast-path declaration (train/sparse_update.py): the ID
        tables are pure row lookups over these batch fields."""
        return {
            "user": ("user_embedding", [self.uid_field]),
            "item": (
                "item_embedding",
                [self.iid_field, self.neg_prefix + self.iid_field],
            ),
        }

    def calculate_loss(self, batch: Batch, estate=None):
        user = batch[self.uid_field]
        pos = batch[self.iid_field]
        neg = batch[self.neg_prefix + self.iid_field]
        u = self.user_e(user, batch, estate)
        p = self.item_e(pos, batch, estate)
        n = self.item_e(neg, batch, estate, field=self.neg_prefix + self.iid_field)
        pos_score = jnp.sum(u * p, axis=1)
        neg_score = jnp.sum(u * n, axis=1)
        return bpr_loss(pos_score, neg_score, batch.get("weight"))

    def predict(self, batch: Batch, estate=None):
        u = self.user_e(batch[self.uid_field], batch, estate)
        i = self.item_e(batch[self.iid_field], batch, estate)
        return jnp.sum(u * i, axis=1)

    def full_sort_scores(self, batch: Batch, estate=None):
        """IV-only full-corpus scores (`bpr.py:158-162`)."""
        u = self.user_e(batch[self.uid_field], batch, estate)
        return u @ self.item_embedding.embedding.T

    def all_item_embeddings(self, item_ids, item_buckets=None, estate=None,
                            item_dhe=None):
        """Embed the full (IV+OOV) item range once per eval pass
        (the item half of `ind_full_sort_predict`, `bpr.py:151-156`)."""
        batch = {self.iid_field: item_ids}
        if item_buckets is not None:
            batch[self.iid_field + "_bucket"] = item_buckets
        if item_dhe is not None:
            batch[self.iid_field + "_dhe"] = item_dhe
        return self.item_e(item_ids, batch, estate)

    def user_tower(self, batch: Batch, estate=None):
        """(B, D) user embeddings for the fused retrieval kernel."""
        return self.user_e(batch[self.uid_field], batch, estate)

    def item_tower(self):
        """(n_items, D) IV item table for the fused retrieval kernel."""
        return self.item_embedding.embedding

    def score_against(self, batch: Batch, all_item_e, estate=None):
        """user_e @ all_item_eᵀ (the retrieval kernel)."""
        u = self.user_e(batch[self.uid_field], batch, estate)
        return u @ all_item_e.T
