"""SASRec (reference `sequential_recommender/sasrec.py`): causal
transformer encoder over the item sequence; last position scores items.

Built on flax attention with a causal+padding mask; layer count/heads/
inner size mirror the reference's TransformerEncoder (`layers.py:388-634`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender


class TransformerBlock(nn.Module):
    n_heads: int
    hidden_size: int
    inner_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.hidden_size,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(h, h, mask=mask)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.inner_size, kernel_init=xavier_normal)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


@register_model
class SASRec(SequentialRecommender):
    # loss consumes only split columns (+ sampled neg) → device-epoch OK
    supports_device_epoch = True
    n_layers: int = 2
    n_heads: int = 2
    inner_size: int = 256
    hidden_dropout_prob: float = 0.5
    attn_dropout_prob: float = 0.5

    def setup(self):
        self.item_embedding = nn.Embed(
            self.n_items, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        self.position_embedding = nn.Embed(
            self.max_seq_length, self.embedding_size,
            embedding_init=xavier_normal,
        )
        self.blocks = [
            TransformerBlock(
                self.n_heads, self.embedding_size, self.inner_size,
                self.hidden_dropout_prob, name=f"block_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.final_ln = nn.LayerNorm()
        self.emb_dropout = nn.Dropout(self.hidden_dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]  # (B, L)
        lengths = batch[self.length_field]
        B, L = seq.shape
        pos = jnp.arange(L)[None, :]
        x = self.item_embedding(seq) + self.position_embedding(pos)
        x = self.emb_dropout(x, deterministic=not train)
        # causal mask ∧ padding mask
        pad = (seq != 0)[:, None, None, :]              # (B, 1, 1, L)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask = pad & causal
        for blk in self.blocks:
            x = blk(x, mask, train=train)
        x = self.final_ln(x)
        return self._gather_last(x, lengths)
