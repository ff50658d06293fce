"""BERT4Rec (reference `sequential_recommender/bert4rec.py`):
bidirectional transformer trained with the cloze objective
(MaskItemSequence transform); inference appends a mask token and scores
its position.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender, _log_softmax
from oovrec_tpu.models.sequential.sasrec import TransformerBlock


@register_model
class BERT4Rec(SequentialRecommender):
    n_layers: int = 2
    n_heads: int = 2
    inner_size: int = 256
    hidden_dropout_prob: float = 0.2
    attn_dropout_prob: float = 0.2

    def setup(self):
        # +1 row for the mask token
        self.item_embedding = nn.Embed(
            self.n_items + 1, self.embedding_size,
            embedding_init=xavier_normal, name="item_embedding",
        )
        self.position_embedding = nn.Embed(
            self.max_seq_length + 1, self.embedding_size,
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

    def _encode(self, seq, train: bool):
        B, L = seq.shape
        pos = jnp.arange(L)[None, :]
        x = self.item_embedding(seq) + self.position_embedding(pos)
        x = self.emb_dropout(x, deterministic=not train)
        pad = (seq != 0)[:, None, None, :]  # bidirectional: padding only
        for blk in self.blocks:
            x = blk(x, pad, train=train)
        return self.final_ln(x)  # (B, L, D)

    def calculate_loss(self, batch, estate=None):
        seq = batch[self.iid_field + self.list_suffix]  # masked by transform
        x = self._encode(seq, train=True)
        mask_index = batch["mask_index"]        # (B, M)
        pos_items = batch["mask_pos_items"]     # (B, M)
        mask_count = batch["mask_count"]        # (B,)
        M = mask_index.shape[1]
        gathered = jnp.take_along_axis(
            x, mask_index[:, :, None], axis=1
        )  # (B, M, D)
        logits = gathered @ self.item_embedding.embedding[: self.n_items].T
        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos_items[:, :, None], axis=2)
        valid = (
            jnp.arange(M)[None, :] < mask_count[:, None]
        ).astype(jnp.float32)
        w = batch.get("weight")
        if w is not None:
            valid = valid * w[:, None]
        return jnp.sum(nll.squeeze(-1) * valid) / jnp.maximum(
            jnp.sum(valid), 1.0
        )

    def seq_output(self, batch, estate=None, train: bool = False):
        """Inference: place the mask token after the sequence and read its
        representation (`bert4rec.py` reconstruct_test_data semantics)."""
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        # append mask token at position `length` (sequences shorter than L)
        pos = jnp.minimum(lengths, L - 1)
        seq2 = seq.at[jnp.arange(B), pos].set(self.n_items)
        x = self._encode(seq2, train=train)
        return jnp.take_along_axis(x, pos[:, None, None], axis=1).squeeze(1)

    def full_sort_scores(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        return out @ self.item_embedding.embedding[: self.n_items].T

    def predict(self, batch, estate=None):
        out = self.seq_output(batch, estate)
        return jnp.sum(
            out * self.item_embedding.embedding[batch[self.iid_field]], axis=1
        )
