"""Sequential recommenders, fifth batch.

References: `sequential_recommender/srgnn.py`, `gcsan.py`,
`lightsans.py`, `sine.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from oovrec_tpu.models.base import register_model
from oovrec_tpu.models.init import xavier_normal
from oovrec_tpu.models.sequential.base import SequentialRecommender
from oovrec_tpu.models.sequential.sasrec import TransformerBlock


def _session_adjacency(seq, mask):
    """Positional transition adjacency (B, L, L): edge t→t+1 where both
    positions are valid; same-item positions share edges implicitly via the
    item embeddings. (The reference compresses to unique items; the
    positional formulation keeps shapes static on TPU with the same
    information flow.)"""
    B, L = seq.shape
    eye_next = jnp.eye(L, k=1)[None]  # (1, L, L): t -> t+1
    valid = (mask[:, :, None] * mask[:, None, :])
    a_out = eye_next * valid
    a_in = jnp.transpose(a_out, (0, 2, 1))

    def norm(a):
        s = jnp.sum(a, axis=2, keepdims=True)
        return a / jnp.maximum(s, 1.0)

    return norm(a_in), norm(a_out)


class GNNCell(nn.Module):
    """SRGNN gated GNN step over in/out adjacencies."""

    hidden_size: int

    @nn.compact
    def __call__(self, a_in, a_out, h):
        hi = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(h)
        ho = nn.Dense(self.hidden_size, kernel_init=xavier_normal)(h)
        inputs = jnp.concatenate(
            [jnp.einsum("blk,bkd->bld", a_in, hi),
             jnp.einsum("blk,bkd->bld", a_out, ho)],
            axis=-1,
        )
        gru = nn.GRUCell(features=self.hidden_size)
        B, L, D = h.shape
        new_h, _ = gru(h.reshape(B * L, D), inputs.reshape(B * L, -1))
        return new_h.reshape(B, L, D)


@register_model
class SRGNN(SequentialRecommender):
    """SRGNN (`srgnn.py`): gated GNN over the session graph; attention
    readout combining last-item local and attentive global states."""

    step: int = 1

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.gnn = GNNCell(D)
        self.w1 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)
        self.w2 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)
        self.q = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.w3 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)

    def _states(self, batch):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        h = self.item_embedding(seq)
        a_in, a_out = _session_adjacency(seq, mask)
        for _ in range(self.step):
            h = self.gnn(a_in, a_out, h)
        return h, mask, lengths

    def seq_output(self, batch, estate=None, train: bool = False):
        h, mask, lengths = self._states(batch)
        last = self._gather_last(h, lengths)
        alpha = self.q(
            nn.sigmoid(self.w1(last)[:, None, :] + self.w2(h))
        ).squeeze(-1)
        alpha = alpha * mask
        global_s = jnp.sum(alpha[:, :, None] * h, axis=1)
        return self.w3(jnp.concatenate([global_s, last], axis=-1))


@register_model
class GCSAN(SRGNN):
    """GCSAN (`gcsan.py`): SRGNN graph states refined by a causal
    self-attention block; convex blend with the last item state."""

    blend_weight: float = 0.6
    n_heads: int = 1
    inner_size: int = 256

    def setup(self):
        super().setup()
        self.attn = TransformerBlock(
            self.n_heads, self.embedding_size, self.inner_size, 0.0,
            name="attn_block",
        )

    def seq_output(self, batch, estate=None, train: bool = False):
        h, mask, lengths = self._states(batch)
        pad = (mask > 0)[:, None, None, :]
        a = self.attn(h, pad, train=train)
        at = self._gather_last(a, lengths)
        ht = self._gather_last(h, lengths)
        w = self.blend_weight
        return w * at + (1 - w) * ht


@register_model
class LightSANs(SequentialRecommender):
    """LightSANs (`lightsans.py`): low-rank decoupled self-attention —
    items attend to k latent interests instead of all L positions."""

    n_layers: int = 1
    n_heads: int = 2
    k_interests: int = 5
    inner_size: int = 256
    dropout_prob: float = 0.4

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.position_embedding = nn.Embed(self.max_seq_length, D,
                                           embedding_init=xavier_normal)
        self.interest_proj = [
            nn.Dense(self.k_interests, kernel_init=xavier_normal,
                     name=f"ip_{i}")
            for i in range(self.n_layers)
        ]
        self.blocks = [
            nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=D,
                deterministic=True, name=f"attn_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.ffn = [
            nn.Dense(D, kernel_init=xavier_normal, name=f"ffn_{i}")
            for i in range(self.n_layers)
        ]
        self.ln = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout_prob)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        x = self.item_embedding(seq) + self.position_embedding(
            jnp.arange(L)[None, :]
        )
        for ip, attn, ffn in zip(self.interest_proj, self.blocks, self.ffn):
            # latent interests: softmax(L→k) pooled keys/values
            w = nn.softmax(
                jnp.where(mask[:, :, None] > 0, ip(x), -1e9), axis=1
            )                                              # (B, L, k)
            interests = jnp.einsum("blk,bld->bkd", w, x)   # (B, k, D)
            y = attn(x, interests)
            x = self.ln(x + self.drop(y, deterministic=not train))
            x = self.ln(x + nn.gelu(ffn(x)))
        return self._gather_last(x, lengths)


@register_model
class SINE(SequentialRecommender):
    """SINE (`sine.py`): sparse interest extraction — attention selects a
    small set of concept prototypes per user; intentions aggregate the
    sequence per concept."""

    prototype_size: int = 8
    interest_size: int = 2
    tau: float = 0.1

    def setup(self):
        D = self.embedding_size
        self.item_embedding = nn.Embed(self.n_items, D,
                                       embedding_init=xavier_normal)
        self.prototypes = self.param(
            "prototypes", xavier_normal, (self.prototype_size, D)
        )
        self.w1 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)
        self.w2 = nn.Dense(1, use_bias=False, kernel_init=xavier_normal)
        self.w3 = nn.Dense(D, use_bias=False, kernel_init=xavier_normal)

    def seq_output(self, batch, estate=None, train: bool = False):
        seq = batch[self.iid_field + self.list_suffix]
        lengths = batch[self.length_field]
        L = seq.shape[1]
        mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(jnp.float32)
        x = self.item_embedding(seq)                       # (B, L, D)
        # virtual user vector: attentive pooling
        a = self.w2(nn.tanh(self.w1(x))).squeeze(-1)
        a = jnp.where(mask > 0, a, -1e9)
        a = nn.softmax(a, axis=1)
        zu = jnp.sum(a[:, :, None] * x, axis=1)            # (B, D)
        # concept activation: top interests soft-selected by similarity
        su = zu @ self.prototypes.T                        # (B, K)
        topk_vals, _ = jax.lax.top_k(su, self.interest_size)
        thresh = topk_vals[:, -1][:, None]
        gate = nn.sigmoid(su) * (su >= thresh)
        cu = gate @ self.prototypes                        # (B, D)
        # intention-weighted sequence aggregation
        pw = nn.softmax(
            jnp.where(
                mask > 0,
                jnp.sum(x * cu[:, None, :], axis=-1) / self.tau, -1e9,
            ),
            axis=1,
        )
        out = jnp.sum(pw[:, :, None] * x, axis=1)
        return self.w3(out + zu)
