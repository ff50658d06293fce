"""GRU4Rec (reference `sequential_recommender/gru4rec.py`): GRU over item
embeddings, final-position state scores items; CE or BPR loss.

TPU note: the recurrence is a `flax.linen.GRUCell` scanned over the static
MAX_ITEM_LIST_LENGTH axis — one compiled scan, no per-step dispatch."""

from __future__ import annotations

import flax.linen as nn

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender


@register_model
class GRU4Rec(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    hidden_size: int = 128
    num_layers: int = 1
    dropout_prob: float = 0.3

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        ScanGRU = nn.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        self.gru_layers = [
            ScanGRU(features=self.hidden_size, name=f"gru_{i}")
            for i in range(self.num_layers)
        ]
        self.dense = nn.Dense(self.embedding_size, kernel_init=xavier_normal)
        self.emb_dropout = nn.Dropout(self.dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]  # (B, L)
        lengths = batch[self.length_field]
        x = self.item_embedding(seq)  # (B, L, D)
        x = self.emb_dropout(x, deterministic=not train)
        B = x.shape[0]
        for gru in self.gru_layers:
            carry = gru.initialize_carry(jax.random.key(0), (B, x.shape[-1]))
            carry, x = gru(carry, x)
        x = self.dense(x)  # (B, L, emb)
        return self._gather_last(x, lengths)


import jax  # noqa: E402
