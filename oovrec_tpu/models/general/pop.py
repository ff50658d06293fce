"""Pop / Random baselines (reference `general_recommender/pop.py`,
`random.py`). Traditional models: no gradient training; their state is a
data statistic injected through `estate` at evaluation time."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, GeneralRecommender, register_model
from oovrec_tpu.utils.enums import InputType, ModelType


@register_model
class Pop(GeneralRecommender):
    """Scores every item by its training interaction count."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE

    def setup(self):
        # single dummy param so init/optimizers have a pytree to hold
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def _counts(self, estate):
        cnt = estate["item_cnt"].astype(jnp.float32)
        return cnt / jnp.maximum(jnp.max(cnt), 1.0)

    def predict(self, batch: Batch, estate=None):
        return self._counts(estate)[batch[self.iid_field]]

    def full_sort_scores(self, batch: Batch, estate=None):
        c = self._counts(estate)
        return jnp.broadcast_to(c, (batch[self.uid_field].shape[0], c.shape[0]))

    @staticmethod
    def build_estate(train_split) -> dict:
        import numpy as np

        cnt = np.zeros(train_split.item_num, dtype=np.int64)
        np.add.at(cnt, train_split.inter[train_split.iid_field], 1)
        return {"item_cnt": cnt}


@register_model
class Random(GeneralRecommender):
    """Uniform random scores (reference `random.py`)."""

    model_type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE

    def setup(self):
        self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

    def calculate_loss(self, batch: Batch, estate=None):
        return jnp.sum(self.dummy * 0.0)

    def predict(self, batch: Batch, estate=None):
        key = jax.random.key(0)
        return jax.random.uniform(key, (batch[self.iid_field].shape[0],))

    def full_sort_scores(self, batch: Batch, estate=None):
        # fold the user ids in so scores differ per row deterministically
        key = jax.random.fold_in(jax.random.key(7), 0)
        return jax.random.uniform(
            key, (batch[self.uid_field].shape[0], self.n_items)
        )
