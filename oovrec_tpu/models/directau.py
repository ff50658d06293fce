"""DirectAU — alignment + uniformity on L2-normalized two-tower embeddings.

Counterpart of `recbole/model/general_recommender/directau.py:18-220`:
  loss = mean‖u−i‖² + γ·(U(u)+U(i))/2,  U(x)=log mean exp(−2‖xᵢ−xⱼ‖²)
computed over the batch's pointwise-expanded rows exactly like the
reference (labels are ignored by the loss, `calculate_loss` `directau.py:88-99`).
The pairwise-distance term uses a weight-masked pair mean so padded rows
contribute nothing.

`full_sort` scoring uses UNNORMALIZED embeddings, mirroring
`ind_full_sort_predict` (`directau.py:193-198`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.utils.enums import InputType


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@register_model
class DirectAU(GeneralRecommender):
    input_type = InputType.POINTWISE
    gamma: float = 1.0

    def setup(self):
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
        """Sparse fast-path declaration (train/sparse_update.py):
        calculate_loss reads only (uid, iid) rows of the ID tables."""
        return {
            "user": ("user_embedding", [self.uid_field]),
            "item": ("item_embedding", [self.iid_field]),
        }

    @staticmethod
    def _alignment(u, i, w):
        d = jnp.sum((u - i) ** 2, axis=1)  # ‖u−i‖₂² (alpha=2)
        if w is None:
            return jnp.mean(d)
        return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)

    @staticmethod
    def _uniformity(x, w, t: float = 2.0):
        """log mean_{i<j} exp(−t‖xᵢ−xⱼ‖²) with pad-pair masking
        (torch.pdist semantics, `directau.py:84-86`)."""
        sq = jnp.sum(x**2, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
        d2 = jnp.maximum(d2, 0.0)
        n = x.shape[0]
        iu = jnp.triu(jnp.ones((n, n), bool), k=1)
        if w is not None:
            pair_w = (w[:, None] * w[None, :]) * iu
        else:
            pair_w = iu.astype(x.dtype)
        e = jnp.exp(-t * d2) * pair_w
        return jnp.log(jnp.sum(e) / jnp.maximum(jnp.sum(pair_w), 1.0))

    def calculate_loss(self, batch: Batch, estate=None):
        user = batch[self.uid_field]
        item = batch[self.iid_field]
        w = batch.get("weight")
        u = _l2norm(self.user_e(user, batch, estate))
        i = _l2norm(self.item_e(item, batch, estate))
        align = self._alignment(u, i, w)
        uniform = self.gamma * (
            self._uniformity(u, w) + self._uniformity(i, w)
        ) / 2.0
        return align + uniform

    def predict(self, batch: Batch, estate=None):
        u = _l2norm(self.user_e(batch[self.uid_field], batch, estate))
        i = _l2norm(self.item_e(batch[self.iid_field], batch, estate))
        return jnp.sum(u * i, axis=1)

    def full_sort_scores(self, batch: Batch, estate=None):
        u = self.user_e(batch[self.uid_field], batch, estate)
        return u @ self.item_embedding.embedding.T

    def all_item_embeddings(self, item_ids, item_buckets=None, estate=None,
                            item_dhe=None):
        b = {self.iid_field: item_ids}
        if item_buckets is not None:
            b[self.iid_field + "_bucket"] = item_buckets
        if item_dhe is not None:
            b[self.iid_field + "_dhe"] = item_dhe
        return self.item_e(item_ids, b, estate)

    def user_tower(self, batch: Batch, estate=None):
        """(B, D) user embeddings for the fused retrieval kernel."""
        return self.user_e(batch[self.uid_field], batch, estate)

    def item_tower(self):
        """(n_items, D) IV item table for the fused retrieval kernel."""
        return self.item_embedding.embedding

    def score_against(self, batch: Batch, all_item_e, estate=None):
        u = self.user_e(batch[self.uid_field], batch, estate)
        return u @ all_item_e.T
