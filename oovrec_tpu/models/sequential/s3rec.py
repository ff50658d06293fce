"""S3Rec (`sequential_recommender/s3rec.py`): self-supervised pretraining
for sequential recommendation with four tasks — Associated Attribute
Prediction, Masked Item Prediction, Masked Attribute Prediction, Segment
Prediction — then SASRec-style finetuning.

TPU design: the reference reconstructs masked sequences host-side with
Python loops (`s3rec.py:278-403`); here all masking/segment corruption is
done on-device from the dropout rng with static shapes (Bernoulli item
masks; fixed-length segments at per-row random offsets; negative segments
taken from the batch-rolled neighbor). Item attributes come from the same
packed feature table the feature-fused models use (estate key
``seq_feat_tokens``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import Batch, register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender, _log_softmax
from oovrec_tpu.models.sequential.featseq import FeatureSeqMixin
from oovrec_tpu.models.sequential.sasrec import TransformerBlock


@register_model
class S3Rec(SequentialRecommender, FeatureSeqMixin):
    n_layers: int = 2
    n_heads: int = 2
    inner_size: int = 256
    hidden_dropout_prob: float = 0.5
    train_stage: str = "pretrain"  # 'pretrain' | 'finetune'
    mask_ratio: float = 0.2
    aap_weight: float = 0.2
    mip_weight: float = 1.0
    map_weight: float = 1.0
    sp_weight: float = 0.5
    selected_features: Tuple[str, ...] = ()
    feat_vocab_size: int = 1
    feat_slices: Tuple[Tuple[int, int], ...] = ()

    @property
    def mask_token(self) -> int:
        return self.n_items  # extra row in the item table

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items + 1, D,
                                       embedding_init=xavier_normal)
        self.position_embedding = nn.Embed(self.max_seq_length, D,
                                           embedding_init=xavier_normal)
        self.feature_embedding = nn.Embed(self.feat_vocab_size, D,
                                          embedding_init=xavier_normal)
        self.blocks = [
            TransformerBlock(self.n_heads, D, self.inner_size,
                             self.hidden_dropout_prob, name=f"block_{i}")
            for i in range(self.n_layers)
        ]
        self.final_ln = nn.LayerNorm()
        self.emb_dropout = nn.Dropout(self.hidden_dropout_prob)
        # bilinear heads (aap_norm/mip_norm/map_norm/sp_norm, s3rec.py:68-71)
        self.aap_norm = nn.Dense(D, kernel_init=xavier_normal)
        self.mip_norm = nn.Dense(D, kernel_init=xavier_normal)
        self.map_norm = nn.Dense(D, kernel_init=xavier_normal)
        self.sp_norm = nn.Dense(D, kernel_init=xavier_normal)

    def _encode(self, seq, train, bidirectional):
        B, L = seq.shape
        x = self.item_embedding(seq) + self.position_embedding(
            jnp.arange(L)[None, :]
        )
        x = self.emb_dropout(x, deterministic=not train)
        pad = (seq != 0)[:, None, None, :]
        if bidirectional:
            mask = pad
        else:
            mask = pad & jnp.tril(jnp.ones((L, L), bool))[None, None]
        for blk in self.blocks:
            x = blk(x, mask, train=train)
        return self.final_ln(x)

    # ---- attribute multi-hot labels from the packed feature table ----
    def _attr_multihot(self, seq, estate):
        tokens = estate["seq_feat_tokens"][
            jnp.minimum(seq, self.n_items - 1)
        ]                                                   # (B, L, C)
        oh = jax.nn.one_hot(tokens, self.feat_vocab_size)   # (B, L, C, V)
        mh = jnp.clip(jnp.sum(oh, axis=2), 0.0, 1.0)
        return mh.at[..., 0].set(0.0)                       # drop pad slot

    @staticmethod
    def _bce(logits, labels):
        return (jnp.maximum(logits, 0) - logits * labels
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    def _pretrain_loss(self, batch, estate):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        B, L = seq.shape
        valid = (jnp.arange(L)[None, :] < lengths[:, None]) & (seq != 0)
        rng = self.make_rng("dropout")
        r_mask, r_neg, r_seg = jax.random.split(rng, 3)

        # ----- item-level masking -----
        bern = jax.random.bernoulli(r_mask, self.mask_ratio, seq.shape)
        masked_pos = bern & valid
        masked_seq = jnp.where(masked_pos, self.mask_token, seq)
        out = self._encode(masked_seq, True, bidirectional=True)  # (B,L,D)
        feat_table = self.feature_embedding.embedding              # (V, D)

        # AAP: attributes at NON-masked valid positions (s3rec.py:211-219)
        aap_logits = self.aap_norm(out) @ feat_table.T
        attr = self._attr_multihot(seq, estate)
        aap = self._bce(aap_logits, attr)
        aap_mask = (valid & ~masked_pos)[..., None]
        aap_loss = jnp.sum(aap * aap_mask)

        # MIP: recover the masked item vs a random negative
        neg = jax.random.randint(r_neg, seq.shape, 1, self.n_items)
        h = self.mip_norm(out)
        pos_s = jnp.sum(h * self.item_embedding(seq), axis=-1)
        neg_s = jnp.sum(h * self.item_embedding(neg), axis=-1)
        mip = self._bce(pos_s - neg_s, jnp.ones_like(pos_s))
        mip_loss = jnp.sum(mip * masked_pos)

        # MAP: attributes at masked positions
        map_logits = self.map_norm(out) @ feat_table.T
        map_loss = jnp.sum(self._bce(map_logits, attr) * masked_pos[..., None])

        # SP: fixed-length segment at a random valid offset per row
        seg_len = max(L // 4, 1)
        start = jax.random.randint(r_seg, (B,), 0,
                                   jnp.maximum(lengths - seg_len, 1))
        idx = jnp.arange(L)[None, :]
        in_seg = (idx >= start[:, None]) & (idx < start[:, None] + seg_len)
        in_seg = in_seg & valid
        masked_segment = jnp.where(in_seg, self.mask_token, seq)
        pos_segment = jnp.where(in_seg, seq, 0)
        neg_segment = jnp.roll(pos_segment, 1, axis=0)
        ctx = self._encode(masked_segment, True, True)[:, -1, :]
        pos_e = self._encode(pos_segment, True, True)[:, -1, :]
        neg_e = self._encode(neg_segment, True, True)[:, -1, :]
        h = self.sp_norm(ctx)
        sp = self._bce(
            jnp.sum(h * pos_e, axis=-1) - jnp.sum(h * neg_e, axis=-1),
            jnp.ones((B,)),
        )
        sp_loss = jnp.sum(sp)

        denom = jnp.maximum(jnp.sum(valid), 1.0)
        return (self.aap_weight * aap_loss + self.mip_weight * mip_loss
                + self.map_weight * map_loss
                + self.sp_weight * sp_loss) / denom

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        out = self._encode(seq, train, bidirectional=False)
        return self._gather_last(out, batch[self.length_field])

    def calculate_loss(self, batch: Batch, estate=None):
        if self.train_stage == "pretrain":
            return self._pretrain_loss(batch, estate)
        out = self.seq_output(batch, estate, train=True)
        pos = batch[self.iid_field]
        w = batch.get("weight")
        logits = out @ self.item_embedding.embedding[: self.n_items].T
        logp = _log_softmax(logits)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=1).squeeze(1)
        if w is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return jnp.sum(
            out * self.item_embedding(batch[self.iid_field]), axis=1
        )

    def full_sort_scores(self, batch: Batch, estate=None):
        out = self.seq_output(batch, estate)
        return out @ self.item_embedding.embedding[: self.n_items].T
