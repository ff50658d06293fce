"""Sequential recommender base (`SequentialRecommender`,
`abstract_recommender.py:241-280` analog)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.inductive.spec import InductiveSpec
from oovrec_tpu.models.base import Batch
from oovrec_tpu.models.losses import bpr_loss
from oovrec_tpu.utils.enums import InputType, ModelType


class SequentialRecommender(nn.Module):
    model_type = ModelType.SEQUENTIAL
    input_type = InputType.POINTWISE

    n_users: int = 0
    n_items: int = 0
    embedding_size: int = 64
    max_seq_length: int = 50
    loss_type: str = "CE"
    spec: Optional[InductiveSpec] = None
    uid_field: str = "user_id"
    iid_field: str = "item_id"
    label_field: str = "label"
    neg_prefix: str = "neg_"
    list_suffix: str = "_list"
    length_field: str = "item_length"

    def seq_output(self, batch: Batch, estate=None, train: bool = False):
        """(B, D) sequence representation — implemented by each model."""
        raise NotImplementedError

    def _gather_last(self, seq_repr, lengths):
        """Take the hidden state at position length-1 per row
        (`gather_indexes`, `abstract_recommender.py:265-272`)."""
        idx = jnp.maximum(lengths - 1, 0)
        return jnp.take_along_axis(
            seq_repr, idx[:, None, None], axis=1
        ).squeeze(1)

    def calculate_loss(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate, train=True)  # (B, D)
        pos = batch[self.iid_field]
        w = batch.get("weight")
        if self.loss_type == "BPR":
            neg = batch[self.neg_prefix + self.iid_field]
            table = self.item_embedding.embedding
            pos_s = jnp.sum(out * table[pos], axis=1)
            neg_s = jnp.sum(out * table[neg], axis=1)
            return bpr_loss(pos_s, neg_s, w)
        # CE over the full item softmax (reference loss_type 'CE')
        logits = out @ self.item_embedding.embedding.T  # (B, n_items)
        logp = jax.nn_log_softmax(logits) if False else _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return jnp.sum(
            out * self.item_embedding.embedding[batch[self.iid_field]], axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return out @ self.item_embedding.embedding.T


def _log_softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


import jax  # noqa: E402
