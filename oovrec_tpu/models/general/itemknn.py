"""ItemKNN (reference `general_recommender/itemknn.py`): item-item cosine
similarity over the training matrix, top-k truncated; traditional model
(no gradients). The similarity computation runs once on the host (NumPy)
and ships to the device as estate."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class ItemKNN(GeneralRecommender):
    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    k: int = 100
    shrink: float = 0.0

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        scores = self.full_sort_scores(batch, estate)
        rows = jnp.arange(scores.shape[0])
        return scores[rows, batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        # user history row (n_items) @ truncated similarity (n_items, n_items)
        hist = estate["user_hist_matrix"][batch[self.uid_field]]  # (B, n_items)
        return hist @ estate["item_sim"]

    @staticmethod
    def build_estate(train_split, k: int = 100, shrink: float = 0.0) -> dict:
        uid = train_split.inter[train_split.uid_field]
        iid = train_split.inter[train_split.iid_field]
        n_u, n_i = train_split.user_num, train_split.item_num
        mat = np.zeros((n_u, n_i), dtype=np.float32)
        mat[uid, iid] = 1.0
        # cosine similarity with shrink (`itemknn.py` ComputeSimilarity)
        norms = np.linalg.norm(mat, axis=0)
        sim = mat.T @ mat
        denom = norms[:, None] * norms[None, :] + shrink + 1e-6
        sim = sim / denom
        np.fill_diagonal(sim, 0.0)
        # top-k truncation per row
        if k < n_i:
            idx = np.argpartition(-sim, kth=min(k, n_i - 1), axis=1)[:, k:]
            np.put_along_axis(sim, idx, 0.0, axis=1)
        return {"item_sim": sim.astype(np.float32), "user_hist_matrix": mat}
