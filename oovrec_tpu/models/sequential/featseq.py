"""Feature-fused sequential recommenders: GRU4RecF, SASRecF, FDSA.

References: `sequential_recommender/gru4recf.py`, `sasrecf.py`, `fdsa.py`
and `FeatureSeqEmbLayer` (`layers.py`).

TPU design: instead of the reference's per-batch feature join, item
feature tokens are packed host-side into a static ``(n_items, C)`` int32
matrix (estate key ``seq_feat_tokens``); the device gathers rows by the
item sequence and embeds them from one offset-packed table. TOKEN_SEQ
features contribute up to ``TOKEN_SEQ_CAP`` slots that are mean-pooled
(the reference's ``pooling_mode: mean``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender
from oovrec_tpu.models.sequential.gru4rec import GRU4Rec
from oovrec_tpu.models.sequential.sasrec import SASRec, TransformerBlock
from oovrec_tpu.utils.enums import FeatureType

TOKEN_SEQ_CAP = 5


class FeatureSeqMixin:
    """Shared plumbing for models embedding per-position item features."""

    selected_features: Tuple[str, ...] = ()
    feat_vocab_size: int = 1
    # per selected feature: (start_col, end_col) into seq_feat_tokens
    feat_slices: Tuple[Tuple[int, int], ...] = ()

    @classmethod
    def derive_kwargs(cls, dataset, config) -> dict:
        sel = tuple(config["selected_features"] or ())
        slices, total, col = [], 1, 0
        for f in sel:
            ft = dataset.field2type[f]
            width = TOKEN_SEQ_CAP if ft == FeatureType.TOKEN_SEQ else 1
            slices.append((col, col + width))
            col += width
            total += dataset.num(f) - 1  # pads of all fields share index 0
        return {
            "selected_features": sel,
            "feat_vocab_size": max(total, 2),
            "feat_slices": tuple(slices),
        }

    @staticmethod
    def build_estate(train_split, config=None) -> dict:
        ds = train_split.parent
        sel = tuple((config["selected_features"] if config else None) or ())
        cols = []
        offset = 0
        for f in sel:
            ft = ds.field2type[f]
            vals = (
                ds.item_feat[f].to_numpy()
                if ds.item_feat is not None and f in ds.item_feat.columns
                else None
            )
            width = TOKEN_SEQ_CAP if ft == FeatureType.TOKEN_SEQ else 1
            block = np.zeros((ds.item_num, width), np.int64)
            if vals is not None:
                if ft == FeatureType.TOKEN_SEQ:
                    for i, v in enumerate(vals):
                        toks = np.asarray(v, np.int64)[:width]
                        block[i, : len(toks)] = toks
                else:
                    block[:, 0] = np.asarray(vals, np.int64)
            block = np.where(block > 0, block + offset, 0)
            offset += ds.num(f) - 1
            cols.append(block)
        if cols:
            mat = np.concatenate(cols, axis=1).astype(np.int32)
        else:
            mat = np.zeros((ds.item_num, 1), np.int32)
        return {"seq_feat_tokens": mat}

    def _feat_seq(self, seq, estate):
        """(B, L) item ids → (B, L, F, D) pooled feature embeddings."""
        tokens = estate["seq_feat_tokens"][seq]  # (B, L, C)
        emb = self.feature_embedding(tokens)     # (B, L, C, D)
        valid = (tokens > 0).astype(emb.dtype)[..., None]
        outs = []
        for s, e in self.feat_slices:
            block = emb[:, :, s:e, :] * valid[:, :, s:e, :]
            denom = jnp.maximum(jnp.sum(valid[:, :, s:e, :], axis=2), 1.0)
            outs.append(jnp.sum(block, axis=2) / denom)
        return jnp.stack(outs, axis=2)           # (B, L, F, D)


@register_model
class GRU4RecF(GRU4Rec, FeatureSeqMixin):
    """GRU4RecF (`gru4recf.py`): parallel item GRU and feature GRU whose
    final states are concatenated then projected."""

    selected_features: Tuple[str, ...] = ()
    feat_vocab_size: int = 1
    feat_slices: Tuple[Tuple[int, int], ...] = ()

    def setup(self):
        super().setup()
        self.feature_embedding = nn.Embed(
            self.feat_vocab_size, self.embedding_size,
            embedding_init=xavier_normal,
        )
        ScanGRU = nn.scan(
            nn.GRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )
        self.feature_gru = ScanGRU(features=self.hidden_size,
                                   name="feature_gru")
        self.dense_fuse = nn.Dense(self.embedding_size,
                                   kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        x = self.item_embedding(seq)
        x = self.emb_dropout(x, deterministic=not train)
        for gru in self.gru_layers:
            carry = gru.initialize_carry(jax.random.key(0), (B, x.shape[-1]))
            carry, x = gru(carry, x)
        f = self._feat_seq(seq, estate).reshape(B, L, -1)
        fc = self.feature_gru.initialize_carry(jax.random.key(0),
                                               (B, f.shape[-1]))
        _, f = self.feature_gru(fc, f)
        out = jnp.concatenate([x, f], axis=-1)
        return self._gather_last(self.dense_fuse(out), lengths)


@register_model
class SASRecF(SASRec, FeatureSeqMixin):
    """SASRecF (`sasrecf.py`): item + feature embeddings concatenated per
    position, projected, then fed through the SASRec transformer."""

    selected_features: Tuple[str, ...] = ()
    feat_vocab_size: int = 1
    feat_slices: Tuple[Tuple[int, int], ...] = ()

    def setup(self):
        super().setup()
        self.feature_embedding = nn.Embed(
            self.feat_vocab_size, self.embedding_size,
            embedding_init=xavier_normal,
        )
        self.concat_proj = nn.Dense(self.embedding_size,
                                    kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        item = self.item_embedding(seq)
        feat = self._feat_seq(seq, estate).reshape(B, L, -1)
        x = self.concat_proj(jnp.concatenate([item, feat], axis=-1))
        x = x + self.position_embedding(jnp.arange(L)[None, :])
        x = self.emb_dropout(x, deterministic=not train)
        pad = (seq != 0)[:, None, None, :]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask = pad & causal
        for blk in self.blocks:
            x = blk(x, mask, train=train)
        return self._gather_last(self.final_ln(x), lengths)


@register_model
class FDSA(SASRec, FeatureSeqMixin):
    """FDSA (`fdsa.py`): two parallel self-attention branches — one over
    item embeddings, one over (vanilla-attention-fused) feature
    embeddings — concatenated at the readout position."""

    selected_features: Tuple[str, ...] = ()
    feat_vocab_size: int = 1
    feat_slices: Tuple[Tuple[int, int], ...] = ()

    def setup(self):
        super().setup()
        self.feature_embedding = nn.Embed(
            self.feat_vocab_size, self.embedding_size,
            embedding_init=xavier_normal,
        )
        # vanilla attention over the feature fields per position
        self.feat_att = nn.Dense(1, kernel_init=xavier_normal)
        self.feat_blocks = [
            TransformerBlock(
                self.n_heads, self.embedding_size, self.inner_size,
                self.hidden_dropout_prob, name=f"feat_block_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.feat_ln = nn.LayerNorm()
        self.out_proj = nn.Dense(self.embedding_size,
                                 kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        pos = self.position_embedding(jnp.arange(L)[None, :])
        pad = (seq != 0)[:, None, None, :]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask = pad & causal

        x = self.item_embedding(seq) + pos
        x = self.emb_dropout(x, deterministic=not train)
        for blk in self.blocks:
            x = blk(x, mask, train=train)
        x = self.final_ln(x)

        feats = self._feat_seq(seq, estate)          # (B, L, F, D)
        w = nn.softmax(self.feat_att(feats), axis=2)  # field attention
        f = jnp.sum(w * feats, axis=2) + pos
        f = self.emb_dropout(f, deterministic=not train)
        for blk in self.feat_blocks:
            f = blk(f, mask, train=train)
        f = self.feat_ln(f)

        out = jnp.concatenate(
            [self._gather_last(x, lengths), self._gather_last(f, lengths)],
            axis=-1,
        )
        return self.out_proj(out)
